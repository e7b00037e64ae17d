"""Merged decompose+whiten kernel (pallas_conv._fused_wow_group) and
the merged WOW body, in interpreter mode on CPU.

The carry row must be *bitwise* equal to the plain decompose path; the
whitened rows are allowed one-ulp differences (rsqrt rewrites, A&S erf
— the same standard as the fused whiten kernel)."""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavelets_tpu.core.transform import decompose
from wavelets_tpu.ops import pallas_conv as PC
from wavelets_tpu.ops.filters import B3SPLINE

W = importlib.import_module("wavelets_tpu.models.wow")


@pytest.fixture
def img32(rng):
    return jnp.asarray(rng.normal(size=(512, 512)).astype(np.float32))


def test_plan_wow_groups_covers():
    groups, covered = PC.plan_wow_groups(4096, 4096, 6, 2)
    assert covered == 6
    assert sum(g for _, g in groups) == 6
    offs = [off for off, _ in groups]
    assert offs == sorted(offs) and offs[0] == 0
    # f64 is not kernel territory
    assert PC.plan_wow_groups(4096, 4096, 6, 2, itemsize=8) == ([], 0)


@pytest.mark.parametrize("off,g", [(0, 3), (3, 2), (5, 1)])
def test_wow_group_matches_xla(img32, off, g):
    # chain the carry to the group offset with the XLA engine
    from wavelets_tpu.ops.conv import smooth

    @jax.jit
    def chain(v):
        for s in range(off):
            v = smooth(v, B3SPLINE, scale=s)
        return v

    cur = chain(img32)
    planes_all = decompose(img32, off + g, B3SPLINE, use_pallas=False)
    cube, acc = PC._fused_wow_group(
        cur, jnp.ones((g,), jnp.float32), jnp.zeros((g,), jnp.float32),
        g, B3SPLINE, offset=off, soft=True, masked=(False,) * g,
        interpret=True)
    ref_r, ref_p = W._wow_body(
        planes_all, jnp.zeros(()), False, B3SPLINE, off + g,
        (1.0,) * (off + g + 1), True, (0.0,) * (off + g) + (1.0,),
        False, True, False, 3.2, None, None, 0.0)
    scale = float(jnp.abs(ref_p).max())
    for k in range(g):
        d = float(jnp.abs(cube[k] - ref_p[off + k]).max())
        assert d < 5e-6 * max(scale, 1), (k, d)
    # carry row bitwise vs the decompose chain
    assert np.array_equal(np.asarray(cube[g]),
                          np.asarray(planes_all[off + g]))
    d = float(jnp.abs(acc - sum(cube[:g])).max())
    assert d < 5e-6 * max(scale, 1)


def test_wow_group_masked(img32):
    g = 3
    thr = jnp.asarray([0.5, 0.2, 0.0], jnp.float32)
    for soft in (True, False):
        cube, acc = PC._fused_wow_group(
            img32, jnp.asarray([2.0, 1.0, 1.0], jnp.float32), thr, g,
            B3SPLINE, offset=0, soft=soft, masked=(True, True, False),
            interpret=True)
        planes = decompose(img32, g, B3SPLINE, use_pallas=False)
        from wavelets_tpu.ops.conv import smooth

        for k, (w, t, m) in enumerate(
                [(2.0, 0.5, True), (1.0, 0.2, True), (1.0, 0.0, False)]):
            c = planes[k]
            lp = smooth(c * c, B3SPLINE, scale=k)
            lp = jnp.sqrt(jnp.where(lp <= 0,
                                    jnp.asarray(1e-15, c.dtype), lp))
            if m and t != 0:
                if soft:
                    c = c * jax.scipy.special.erf(jnp.abs(c / t))
                else:
                    c = c * (jnp.abs(c) > t).astype(c.dtype)
            ref = c * (w / lp)
            d = float(jnp.abs(cube[k] - ref).max())
            scale = float(jnp.abs(ref).max())
            assert d < 5e-6 * max(scale, 1), (k, soft, d)


@pytest.mark.parametrize("level,dc", [
    (6, None),                      # no denoise
    (6, (5.0, 2.0)),                # lazy-noise denoise
    (8, (5.0, 2.0)),                # deep tail through the deep kernel
])
def test_wow_body_merged_matches_xla(img32, level, dc):
    dcoef = ((dc or ()) + (0.0,) * level)[:level] + (1.0,)
    got_r, got_p = W._wow_body_merged(
        img32, jnp.zeros(()), False, B3SPLINE, level,
        (1.0,) * (level + 1), dcoef, True)
    planes = decompose(img32, level, B3SPLINE, use_pallas=False)
    ref_r, ref_p = W._wow_body(
        planes, jnp.zeros(()), False, B3SPLINE, level,
        (1.0,) * (level + 1), True, dcoef, False, True, False, 3.2,
        None, None, 0.0)
    scale = float(jnp.max(jnp.abs(ref_r)))
    assert float(jnp.max(jnp.abs(got_r - ref_r))) < 5e-6 * max(scale, 1)
    assert float(jnp.max(jnp.abs(got_p - ref_p))) < 5e-6 * max(scale, 1)


def test_can_merge_dispatch():
    x = jnp.zeros((512, 512), jnp.float32)
    assert not W._can_merge_whiten(x, B3SPLINE, 6, lazy_masked=True)
    assert not W._can_merge_whiten(
        x.astype(jnp.float64), B3SPLINE, 6, lazy_masked=False)
    assert not W._can_merge_whiten(
        jnp.zeros((3, 512, 512), jnp.float32), B3SPLINE, 6,
        lazy_masked=False)
    # CPU backend always falls back (kernels run compiled on TPU only)
    assert not W._can_merge_whiten(x, B3SPLINE, 6, lazy_masked=False)


def test_wow_body_fused_preserve_variance(img32):
    """preserve_variance rides the fused whiten via runtime factors
    (per-scale sqrt(mean(c²)) power norms)."""
    from wavelets_tpu.core.transform import decompose_pieces

    level = 4
    dcoef = (5.0, 2.0, 0.0, 0.0, 1.0)
    pieces, layout = decompose_pieces(img32, level, B3SPLINE,
                                      use_pallas=True)
    zero = jnp.zeros(())
    got_r, got_p = W._wow_body_fused(
        pieces, layout, None, zero, False, B3SPLINE, level,
        (1.0,) * (level + 1), dcoef, True, preserve_variance=True)
    planes = decompose(img32, level, B3SPLINE, use_pallas=False)
    ref_r, ref_p = W._wow_body(
        planes, zero, False, B3SPLINE, level, (1.0,) * (level + 1),
        True, dcoef, False, True, True, 3.2, None, None, 0.0)
    scale = float(jnp.max(jnp.abs(ref_r)))
    assert float(jnp.max(jnp.abs(got_r - ref_r))) < 5e-6 * max(scale, 1)
    assert float(jnp.max(jnp.abs(got_p - ref_p))) < 5e-6 * max(scale, 1)


@pytest.mark.parametrize("pv", [False, True])
def test_wow_body_fused_gamma_blend(img32, pv):
    """0 < h < 1 rides the fused whiten via the kernel's third
    (masked-plane sum) accumulator; tone map applied on top."""
    from wavelets_tpu.core.transform import decompose_pieces

    level, h = 4, 0.4
    dcoef = (5.0, 2.0, 0.0, 0.0, 1.0)
    pieces, layout = decompose_pieces(img32, level, B3SPLINE,
                                      use_pallas=True)
    zero = jnp.zeros(())
    got_r, got_p = W._wow_body_fused(
        pieces, layout, None, zero, False, B3SPLINE, level,
        (1.0,) * (level + 1), dcoef, True, preserve_variance=pv,
        h=h, gamma=3.2)
    planes = decompose(img32, level, B3SPLINE, use_pallas=False)
    ref_r, ref_p = W._wow_body(
        planes, zero, False, B3SPLINE, level, (1.0,) * (level + 1),
        True, dcoef, False, True, pv, 3.2, None, None, h)
    scale = float(jnp.max(jnp.abs(ref_r)))
    assert float(jnp.max(jnp.abs(got_r - ref_r))) < 5e-6 * max(scale, 1)
    assert float(jnp.max(jnp.abs(got_p - ref_p))) < 5e-6 * max(scale, 1)


def test_wow_body_fused_gamma_batched(rng):
    """Batched gamma blend: per-frame tone-map bounds match a vmap of
    the single-frame XLA body."""
    from wavelets_tpu.core.transform import decompose_pieces

    stack = jnp.asarray(rng.normal(size=(2, 256, 256)).astype(np.float32))
    level, h = 3, 0.3
    dcoef = (5.0, 2.0, 0.0, 1.0)
    pieces, layout = decompose_pieces(stack, level, B3SPLINE,
                                      axes=(1, 2), use_pallas=True)
    noise = jnp.zeros((2,))
    got_r, got_p = W._wow_body_fused(
        pieces, layout, None, noise, False, B3SPLINE, level,
        (1.0,) * (level + 1), dcoef, True, h=h, gamma=3.2)

    def one(frame):
        planes = decompose(frame, level, B3SPLINE, use_pallas=False)
        return W._wow_body(
            planes, jnp.zeros(()), False, B3SPLINE, level,
            (1.0,) * (level + 1), True, dcoef, False, True, False,
            3.2, None, None, h, rops=W.VmapSafeReduceOps())

    ref_r, ref_p = jax.vmap(one)(stack)
    scale = float(jnp.max(jnp.abs(ref_r)))
    assert float(jnp.max(jnp.abs(got_r - ref_r))) < 5e-6 * max(scale, 1)
    assert float(jnp.max(jnp.abs(got_p - ref_p))) < 5e-6 * max(scale, 1)


def test_merged_need_planes_recon_bitwise(rng):
    """Serving mode (need_planes=False) must not change the
    reconstruction: same tile plans, same fold order — only the plane
    cube writes are skipped."""
    x = jnp.asarray(rng.normal(size=(512, 512)).astype(np.float32))
    noise = jnp.ones((), jnp.float32)
    kw = dict(sf=B3SPLINE, n_scales=6,
              weights=(1.0,) * 7,
              denoise_coefficients=(5.0, 2.0) + (0.0,) * 4 + (1.0,),
              soft_threshold=True)
    r1, cube = W._wow_body_merged(x, noise, True, **kw)
    r2, none = W._wow_body_merged(x, noise, True, need_planes=False,
                                  **kw)
    assert none is None
    assert cube.shape[0] == 7
    # bitwise on hardware (same kernels either way; asserted per round
    # by scripts/tpu_check.py); on CPU the *interpret-mode* kernel ops
    # inline into two different XLA programs whose fusion/FMA
    # contraction can differ by 1 ulp (cf. tests/test_pallas_deep.py
    # module docstring)
    tol = 4 * np.finfo(np.float32).eps * float(np.abs(r1).max())
    assert float(np.abs(np.asarray(r1) - np.asarray(r2)).max()) <= tol


def test_merged_batched_serving(rng):
    """Frame-stack serving through the merged body (need_planes=False):
    per-frame statistics, recon matches per-frame single calls."""
    stack = jnp.asarray(
        rng.normal(size=(2, 256, 256)).astype(np.float32))
    noise = jnp.asarray([1.0, 2.0], jnp.float32)
    kw = dict(sf=B3SPLINE, n_scales=6, weights=(1.0,) * 7,
              denoise_coefficients=(5.0, 2.0) + (0.0,) * 4 + (1.0,),
              soft_threshold=True)
    rb, none = W._wow_body_merged(stack, noise, True,
                                  need_planes=False, **kw)
    assert none is None
    for b in range(2):
        rs, _ = W._wow_body_merged(stack[b], noise[b], True,
                                   need_planes=False, **kw)
        assert np.array_equal(np.asarray(rb[b]), np.asarray(rs)), b


def test_merged_bf16(rng):
    """The merged body is dtype-generic: bf16 tracks the XLA bf16
    path (dtype-preserving engine) to bf16 rounding tolerance."""
    x = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
    xb = x.astype(jnp.bfloat16)
    kw = dict(sf=B3SPLINE, n_scales=6, weights=(1.0,) * 7,
              denoise_coefficients=(5.0, 2.0) + (0.0,) * 4 + (1.0,),
              soft_threshold=True)
    rb, planes = W._wow_body_merged(xb, jnp.ones((), jnp.bfloat16),
                                    True, **kw)
    assert rb.dtype == jnp.bfloat16
    assert planes.dtype == jnp.bfloat16
    r32, _ = W._wow_body_merged(x, jnp.ones(()), True, **kw)
    d = float(jnp.abs(rb.astype(jnp.float32) - r32).max())
    scale = float(jnp.abs(r32).max())
    assert d < 0.05 * max(scale, 1), d
    # serving variant stays bitwise vs its cube-bearing twin
    rb2, none = W._wow_body_merged(xb, jnp.ones((), jnp.bfloat16),
                                   True, need_planes=False, **kw)
    assert none is None
    assert np.array_equal(np.asarray(rb.astype(jnp.float32)),
                          np.asarray(rb2.astype(jnp.float32)))


def test_wow_body_fused_preserve_variance_batched(rng):
    """Batched preserve_variance: the per-(scale, frame) factor table
    matches a vmap of the single-frame XLA body."""
    from wavelets_tpu.core.transform import decompose_pieces

    stack = jnp.asarray(rng.normal(size=(2, 256, 256)).astype(np.float32))
    level = 3
    dcoef = (5.0, 2.0, 0.0, 1.0)
    pieces, layout = decompose_pieces(stack, level, B3SPLINE,
                                      axes=(1, 2), use_pallas=True)
    noise = jnp.zeros((2,))
    got_r, got_p = W._wow_body_fused(
        pieces, layout, None, noise, False, B3SPLINE, level,
        (1.0,) * (level + 1), dcoef, True, preserve_variance=True)

    def one(frame):
        planes = decompose(frame, level, B3SPLINE, use_pallas=False)
        return W._wow_body(
            planes, jnp.zeros(()), False, B3SPLINE, level,
            (1.0,) * (level + 1), True, dcoef, False, True, True,
            3.2, None, None, 0.0, rops=W.VmapSafeReduceOps())

    ref_r, ref_p = jax.vmap(one)(stack)
    scale = float(jnp.max(jnp.abs(ref_r)))
    assert float(jnp.max(jnp.abs(got_r - ref_r))) < 5e-6 * max(scale, 1)
    assert float(jnp.max(jnp.abs(got_p - ref_p))) < 5e-6 * max(scale, 1)


def test_reuse_pieces_rows_form(img32):
    """The coefficients-reuse entry presents the plane rows as one
    piece each (layout (s, 0)) to the fused whiten
    (models/wow.py _wow_from_planes_core); golden vs the XLA body."""
    level = 8
    planes = decompose(img32, level, B3SPLINE, use_pallas=False)
    dcoef = (5.0, 2.0) + (0.0,) * (level - 2) + (1.0,)
    ref_r, ref_p = W._wow_body(
        planes, jnp.zeros(()), False, B3SPLINE, level,
        (1.0,) * (level + 1), True, dcoef, False, True, False, 3.2,
        None, None, 0.0)
    pieces = tuple(planes[s][None] for s in range(level + 1))
    layout = tuple((s, 0) for s in range(level + 1))
    got_r, got_p = W._wow_body_fused(
        pieces, layout, None, jnp.zeros(()), False, B3SPLINE, level,
        (1.0,) * (level + 1), dcoef, True, planes_layout="rows")
    scale = float(jnp.abs(ref_r).max())
    d = float(jnp.abs(got_r - ref_r).max())
    assert d < 5e-6 * max(scale, 1)
    assert len(got_p) == level + 1
    for s in range(level + 1):
        d = float(jnp.abs(got_p[s] - ref_p[s]).max())
        sc = float(jnp.abs(ref_p[s]).max())
        assert d < 5e-6 * max(sc, 1), (s, d)


def test_fused_group_odd_shape_bitwise(rng):
    """Pad-to-tile: a non-multiple-of-256 shape rides the fused
    decompose group bitwise (symmetric extension commutes with the
    symmetric folds, so pad >= reach + crop is exact)."""
    x = jnp.asarray(rng.normal(size=(523, 517)).astype(np.float32))
    got = PC._fused_group(x, 3, B3SPLINE, interpret=True)
    ref = decompose(x, 3, B3SPLINE, use_pallas=False)
    assert got.shape == ref.shape
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_wow_group_odd_shape(rng):
    """Padded whiten group: carry bitwise, whitened rows to tolerance."""
    from wavelets_tpu.ops.conv import smooth

    x = jnp.asarray(rng.normal(size=(600, 520)).astype(np.float32))
    g = 3
    rows, acc = PC._fused_wow_group(
        x, jnp.ones((g,), jnp.float32), jnp.zeros((g,), jnp.float32),
        g, B3SPLINE, masked=(False,) * g, interpret=True)
    planes = decompose(x, g, B3SPLINE, use_pallas=False)
    assert np.array_equal(np.asarray(rows[g]), np.asarray(planes[g]))
    cur = x
    for s in range(g):
        sm = smooth(cur, B3SPLINE, scale=s)
        w = cur - sm
        lp = smooth(w * w, B3SPLINE, scale=s)
        lp = jnp.sqrt(jnp.where(lp <= 0, 1e-15, lp))
        ref = w / lp
        d = float(jnp.abs(rows[s] - ref).max())
        sc = float(jnp.abs(ref).max())
        assert d < 5e-6 * max(sc, 1), (s, d)
        cur = sm


def test_wow_body_merged_odd_shape(rng):
    """End-to-end odd-shape WOW through the merged body (padded groups
    + XLA tail) vs the XLA body."""
    x = jnp.asarray(rng.normal(size=(523, 517)).astype(np.float32))
    level = 6
    dcoef = (0.0,) * level + (1.0,)
    got_r, got_p = W._wow_body_merged(
        x, jnp.ones(()), True, B3SPLINE, level, (1.0,) * (level + 1),
        dcoef, True)
    planes = decompose(x, level, B3SPLINE, use_pallas=False)
    ref_r, ref_p = W._wow_body(
        planes, jnp.ones(()), True, B3SPLINE, level,
        (1.0,) * (level + 1), True, dcoef, False, True, False, 3.2,
        None, None, 0.0)
    scale = float(jnp.max(jnp.abs(ref_r)))
    assert float(jnp.max(jnp.abs(got_r - ref_r))) < 5e-6 * max(scale, 1)
    assert float(jnp.max(jnp.abs(got_p - ref_p))) < 5e-6 * max(scale, 1)
