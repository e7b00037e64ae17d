"""Fused Pallas kernel vs the XLA reference path, run in interpreter mode
on CPU (the TPU runs the same kernel compiled; bitwise equality with the
XLA path is additionally verified on hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavelets_tpu.core.transform import decompose
from wavelets_tpu.ops import pallas_conv
from wavelets_tpu.ops.filters import B3SPLINE, TRIANGLE


@pytest.fixture
def img32(rng):
    return jnp.asarray(rng.normal(size=(512, 512)).astype(np.float32))


@pytest.mark.parametrize("sf,level", [
    (B3SPLINE, 1), (B3SPLINE, 3), (B3SPLINE, 6),
    (TRIANGLE, 4), (TRIANGLE, 6),
])
def test_fused_matches_xla(img32, sf, level):
    ref = decompose(img32, level, sf, use_pallas=False)
    got = decompose(img32, level, sf, use_pallas=True)
    assert np.array_equal(np.asarray(got), np.asarray(ref)), (
        np.abs(np.asarray(got) - np.asarray(ref)).max())


def test_fused_deep_tail(img32):
    """Levels beyond the fused group chain through the XLA tail."""
    ref = decompose(img32, 8, B3SPLINE, use_pallas=False)
    got = decompose(img32, 8, B3SPLINE, use_pallas=True)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_fused_round_trip(img32):
    got = decompose(img32, 6, B3SPLINE, use_pallas=True)
    rt = np.abs(np.asarray(jnp.sum(got, 0)) - np.asarray(img32)).max()
    assert rt < 1e-6


def test_fused_rectangular(rng):
    x = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32))
    ref = decompose(x, 4, B3SPLINE, use_pallas=False)
    got = decompose(x, 4, B3SPLINE, use_pallas=True)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_can_fuse_dispatch():
    x32 = jnp.zeros((512, 512), jnp.float32)
    assert pallas_conv.can_fuse(x32, 6, B3SPLINE, None, (0, 1),
                                "symmetric", backend="tpu")
    # f64, bilateral, reflect boundary → no fuse
    assert not pallas_conv.can_fuse(
        jnp.zeros((512, 512), jnp.float64), 6, B3SPLINE, None, (0, 1),
        "symmetric", backend="tpu")
    assert not pallas_conv.can_fuse(
        x32, 6, B3SPLINE, (1.0,) * 7, (0, 1), "symmetric", backend="tpu")
    # non-tile-divisible shapes now ride the padded fast path
    assert pallas_conv.can_fuse(
        jnp.zeros((500, 512), jnp.float32), 6, B3SPLINE, None, (0, 1),
        "symmetric", backend="tpu")
    assert not pallas_conv.can_fuse(
        x32, 6, B3SPLINE, None, (0, 1), "reflect", backend="tpu")
    assert not pallas_conv.can_fuse(
        x32, 6, B3SPLINE, None, (0, 1), "symmetric", backend="cpu")


def test_deferred_tail_wow(img32, monkeypatch):
    """wow with a deferred decompose tail (deep scales computed inline
    in the whitening loop) matches the fully-materialized body.  The
    plan is forced to leave a 2-scale tail so the deferral logic runs
    even at test size."""
    import importlib

    from wavelets_tpu.core.transform import decompose_pieces
    W = importlib.import_module("wavelets_tpu.models.wow")

    monkeypatch.setattr(pallas_conv, "plan_groups",
                        lambda H, w, level, hw, itemsize=4:
                        ([(0, 2)], level - 2))
    pieces, layout, tail = decompose_pieces(
        img32, 4, B3SPLINE, use_pallas=True, defer_tail=True)
    assert tail is not None and tail[1] == 2
    assert len(layout) == 2
    zero = jnp.zeros((), jnp.float32)
    got_r, got_p = W._wow_body_fused(
        pieces, layout, tail, zero, False, B3SPLINE, 4, (1.0,) * 5,
        (5.0, 2.0, 0.0, 0.0, 1.0), True)
    planes = decompose(img32, 4, B3SPLINE, use_pallas=False)
    ref_r, ref_p = W._wow_body(
        planes, zero, False, B3SPLINE, 4, (1.0,) * 5, True,
        (5.0, 2.0, 0.0, 0.0, 1.0), False, True, False, 3.2, None,
        None, 0.0)
    scale = float(jnp.max(jnp.abs(ref_r)))
    assert float(jnp.max(jnp.abs(got_r - ref_r))) < 5e-6 * max(scale, 1)
    assert float(jnp.max(jnp.abs(got_p - ref_p))) < 5e-6 * max(scale, 1)


def test_batched_fused_wow_per_frame(rng):
    """Batched fused wow body (leading frame dim through the kernels)
    computes per-frame statistics — matches a loop of single-frame
    bodies."""
    import importlib

    from wavelets_tpu.core.transform import decompose, decompose_pieces
    W = importlib.import_module("wavelets_tpu.models.wow")

    stack = jnp.asarray(
        rng.normal(size=(3, 256, 256)).astype(np.float32))
    stack = stack * jnp.asarray([1.0, 3.0, 0.5],
                                jnp.float32)[:, None, None]
    pieces, layout, tail = decompose_pieces(
        stack, 3, B3SPLINE, axes=(1, 2), use_pallas=True,
        defer_tail=True)
    zero = jnp.zeros((3,), jnp.float32)
    got_r, got_p = W._wow_body_fused(
        pieces, layout, tail, zero, False, B3SPLINE, 3, (1.0,) * 4,
        (5.0, 2.0, 0.0, 1.0), True)
    assert got_p.shape == (3, 4, 256, 256)
    for b in range(3):
        planes = decompose(stack[b], 3, B3SPLINE, use_pallas=False)
        # per-frame noise must match the single-frame lazy MAD path
        ref_r, ref_p = W._wow_body(
            planes, jnp.zeros(()), False, B3SPLINE, 3, (1.0,) * 4,
            True, (5.0, 2.0, 0.0, 1.0), False, True, False, 3.2,
            None, None, 0.0, rops=W.VmapSafeReduceOps())
        scale = float(jnp.max(jnp.abs(ref_r)))
        assert float(jnp.max(jnp.abs(got_r[b] - ref_r))) < 5e-6 * scale
        assert float(jnp.max(jnp.abs(got_p[b] - ref_p))) < 5e-6 * scale


def test_fused_bilateral_matches_xla(img32):
    """Fused bilateral decompose kernel vs the XLA shift-add bilateral
    path (f32 tolerance: tap order and variance fusion differ)."""
    bil = (1.0,) * 5
    ref = decompose(img32, 4, B3SPLINE, bilateral=bil, use_pallas=False)
    got = decompose(img32, 4, B3SPLINE, bilateral=bil, use_pallas=True)
    scale = float(np.abs(np.asarray(ref)).max())
    d = np.abs(np.asarray(got) - np.asarray(ref)).max()
    assert d < 5e-6 * max(scale, 1)
    rt = np.abs(np.asarray(jnp.sum(got, 0)) - np.asarray(img32)).max()
    assert rt < 1e-6


def test_fused_bilateral_scaling_variant(rng):
    x = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32))
    bil = (2.0, 1.5, 1.0, 0.5)
    ref = decompose(x, 3, B3SPLINE, bilateral=bil, bilateral_scaling=True,
                    use_pallas=False)
    got = decompose(x, 3, B3SPLINE, bilateral=bil, bilateral_scaling=True,
                    use_pallas=True)
    d = np.abs(np.asarray(got) - np.asarray(ref)).max()
    assert d < 5e-6


def test_bilateral_fused_wow_body(img32):
    """Bilateral WOW through the fused whiten body (bilateral σ_e table,
    bilateral deferred-tail smooth) matches the XLA body."""
    import importlib

    from wavelets_tpu.core.transform import decompose_pieces
    W = importlib.import_module("wavelets_tpu.models.wow")

    bil = (1.0,) * 4
    pieces, layout, tail = decompose_pieces(
        img32, 3, B3SPLINE, bilateral=bil, use_pallas=True,
        defer_tail=True)
    zero = jnp.zeros((), jnp.float32)
    got_r, got_p = W._wow_body_fused(
        pieces, layout, tail, zero, False, B3SPLINE, 3, (1.0,) * 4,
        (5.0, 2.0, 0.0, 1.0), True, bilateral=bil)
    planes = decompose(img32, 3, B3SPLINE, bilateral=bil,
                       use_pallas=False)
    ref_r, ref_p = W._wow_body(
        planes, zero, False, B3SPLINE, 3, (1.0,) * 4, True,
        (5.0, 2.0, 0.0, 1.0), True, True, False, 3.2, None, None, 0.0)
    scale = float(jnp.max(jnp.abs(ref_r)))
    assert float(jnp.max(jnp.abs(got_r - ref_r))) < 1e-5 * max(scale, 1)
    assert float(jnp.max(jnp.abs(got_p - ref_p))) < 1e-5 * max(scale, 1)


def test_fused_bf16_matches_xla_bf16(rng):
    """The kernels are dtype-generic: forced-bf16 fused decompose matches
    the XLA bf16 path within bf16 rounding.  (Dispatch keeps bf16 on the
    XLA path for speed; this guards the kernel's generality.)"""
    x = jnp.asarray(rng.normal(size=(512, 512)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    ref = decompose(x, 4, B3SPLINE, use_pallas=False)
    got = decompose(x, 4, B3SPLINE, use_pallas=True)
    d = np.abs(np.asarray(got.astype(jnp.float32))
               - np.asarray(ref.astype(jnp.float32))).max()
    assert d < 0.05


def test_fused_column_reuse(rng):
    """Widths that force several column tiles exercise the edge-save
    column-halo reuse path (interior tiles DMA only fresh columns);
    the assembled window must be byte-identical to the full fetch."""
    x = jnp.asarray(rng.normal(size=(512, 1536)).astype(np.float32))
    ref = decompose(x, 5, B3SPLINE, use_pallas=False)
    got = pallas_conv._fused_group(x, 5, B3SPLINE, interpret=True)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_fused_wow_column_reuse(rng):
    """Merged decompose+whiten group over several column tiles."""
    from wavelets_tpu.ops.conv import smooth

    x = jnp.asarray(rng.normal(size=(512, 1536)).astype(np.float32))
    g = 4
    factors = jnp.ones((g,), jnp.float32)
    thresholds = jnp.zeros((g,), jnp.float32)
    cube, acc = pallas_conv._fused_wow_group(
        x, factors, thresholds, g, B3SPLINE, masked=(False,) * g,
        interpret=True)
    planes = decompose(x, g, B3SPLINE, use_pallas=False)
    want_white = []
    cur = x
    for s in range(g):
        sm = smooth(cur, B3SPLINE, scale=s)
        w = cur - sm
        lp = smooth(w * w, B3SPLINE, scale=s)
        lp = jnp.sqrt(jnp.where(lp <= 0, 1e-15, lp))
        want_white.append(w / lp)
        cur = sm
    got_carry = np.asarray(cube[g])
    assert np.array_equal(got_carry, np.asarray(planes[g]))
    for s in range(g):
        d = np.abs(np.asarray(cube[s]) - np.asarray(want_white[s]))
        assert d.max() < 1e-5, (s, d.max())
    accd = np.abs(np.asarray(acc) - np.asarray(sum(want_white)))
    assert accd.max() < 1e-5
