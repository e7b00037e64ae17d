"""Fused deep-scale whiten step (ops/pallas_deep.py) vs the XLA
deferred-tail path, in interpreter mode on CPU.

The carry chain (``c_next``) is *bitwise* equal to the XLA smooth on
TPU hardware (asserted every round by scripts/tpu_check.py — it feeds
every later scale).  Pallas *interpreter* mode compiles the identical
fold expression with one extra FMA contraction (verified: the same
``a·t₀ + t₁·(b+c)`` chain differs by 1 ulp between plain jnp and a
pallas_call(interpret=True) around it), so the CPU tests here assert
≤1-ulp bit distance instead.  The whitened output is allowed small
relative differences (XLA rewrites ``x / sqrt(lp)`` to rsqrt inside
its fusions; the erf mask uses the same A&S approximation as the fused
whiten kernel)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import importlib

W = importlib.import_module("wavelets_tpu.models.wow")
from wavelets_tpu.ops import pallas_conv
from wavelets_tpu.ops.conv import smooth
from wavelets_tpu.ops.filters import B3SPLINE
from wavelets_tpu.ops.pallas_deep import can_deep, deep_whiten_step


@pytest.fixture
def img32(rng):
    return jnp.asarray(rng.normal(size=(512, 512)).astype(np.float32))


def assert_ulp(a, b, ulps=4):
    """Assert |a−b| within ``ulps`` units-in-last-place of the larger
    operand's magnitude scale (interpret-mode FMA contraction rounds the
    fold once less than plain XLA — ~1e-7 absolute on O(1) data, which
    is a huge *bit* distance on near-zero elements; hardware is bitwise,
    see module docstring)."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    tol = ulps * np.finfo(np.float32).eps * max(
        np.abs(b).max(), np.abs(a).max())
    d = np.abs(a - b).max()
    assert d <= tol, f"max abs diff {d} > {tol}"


def _ref_step(carry, s, weight=1.0, threshold=0.0, soft=True):
    @jax.jit
    def step(v):
        c_next = smooth(v, B3SPLINE, scale=s)
        c = v - c_next
        lp = smooth(c * c, B3SPLINE, scale=s)
        lp = jnp.sqrt(jnp.where(lp <= 0, jnp.asarray(1e-15, c.dtype),
                                lp))
        if threshold != 0:
            if soft:
                cm = c * jax.scipy.special.erf(jnp.abs(c / threshold))
            else:
                cm = c * (jnp.abs(c) > threshold).astype(c.dtype)
        else:
            cm = c
        return cm * (weight / lp), c_next

    return step(carry)


@pytest.mark.parametrize("s", [6, 7])
def test_deep_step_matches_xla(img32, s):
    x = img32[None]
    recon = jnp.zeros_like(x)
    assert can_deep(x, B3SPLINE, s, None)
    white, r_out, cn = deep_whiten_step(
        x, recon, jnp.zeros((1,)), sf=B3SPLINE, scale=s, weight=1.0,
        masked=False, interpret=True)
    ref_w, ref_c = _ref_step(img32, s)
    # carry chain: bitwise on hardware; <=1 ulp in interpret mode
    assert_ulp(cn[0], ref_c)
    d = float(jnp.abs(white[0] - ref_w).max())
    scale = float(jnp.abs(ref_w).max())
    assert d < 5e-6 * max(scale, 1)
    assert np.array_equal(np.asarray(r_out), np.asarray(white))


def test_deep_step_masked_per_frame(rng):
    stack = jnp.asarray(rng.normal(size=(2, 512, 512)).astype(np.float32))
    recon = jnp.zeros_like(stack)
    thr = jnp.asarray([0.5, 0.0], jnp.float32)
    for soft in (True, False):
        white, r_out, cn = deep_whiten_step(
            stack, recon, thr, sf=B3SPLINE, scale=6, weight=2.0,
            soft=soft, masked=True, interpret=True)
        for b in range(2):
            ref_w, ref_c = _ref_step(stack[b], 6, weight=2.0,
                                     threshold=float(thr[b]), soft=soft)
            assert_ulp(cn[b], ref_c)
            d = float(jnp.abs(white[b] - ref_w).max())
            scale = float(jnp.abs(ref_w).max())
            assert d < 5e-6 * max(scale, 1)


def test_deep_step_write_plane_off(img32):
    x = img32[None]
    recon = jnp.zeros_like(x)
    white, r_out, cn = deep_whiten_step(
        x, recon, jnp.zeros((1,)), sf=B3SPLINE, scale=6, weight=1.0,
        masked=False, write_plane=False, interpret=True)
    assert white is None
    w2, r2, c2 = deep_whiten_step(
        x, recon, jnp.zeros((1,)), sf=B3SPLINE, scale=6, weight=1.0,
        masked=False, write_plane=True, interpret=True)
    assert np.array_equal(np.asarray(r_out), np.asarray(r2))
    assert np.array_equal(np.asarray(cn), np.asarray(c2))


def test_can_deep_dispatch():
    x = jnp.zeros((1, 512, 512), jnp.float32)
    assert can_deep(x, B3SPLINE, 6, None)
    assert can_deep(x, B3SPLINE, 7, None)          # 2hw·D == H edge
    assert not can_deep(x, B3SPLINE, 8, None)      # reflection > 1 bounce
    assert can_deep(x, B3SPLINE, 5, None)          # stream (r3): hw·D = 64
    assert can_deep(x, B3SPLINE, 4, None)          # stream (r3): hw·D = 32
    assert not can_deep(x, B3SPLINE, 3, None)      # hw·D = 16: Mosaic roll
    # lowering hangs below 32 (measured) — XLA path
    assert not can_deep(x, B3SPLINE, 6, (1.0,) * 7)  # bilateral chain
    assert not can_deep(x.astype(jnp.float64), B3SPLINE, 6, None)
    assert not can_deep(jnp.zeros((1, 500, 512), jnp.float32),
                        B3SPLINE, 6, None)         # rows not tileable


def test_wow_tail_deep(img32, monkeypatch):
    """Full WOW body with a deferred tail spanning XLA-only scales
    (s < 6) and fused deep scales (s ≥ 6) matches the materialized XLA
    body."""
    from wavelets_tpu.core.transform import decompose, decompose_pieces

    monkeypatch.setattr(pallas_conv, "plan_groups",
                        lambda H, w, level, hw, itemsize=4:
                        ([(0, 2)], level - 2))
    level = 8
    pieces, layout, tail = decompose_pieces(
        img32, level, B3SPLINE, use_pallas=True, defer_tail=True)
    assert tail is not None and tail[1] == 6
    zero = jnp.zeros((), jnp.float32)
    dc = (5.0, 2.0) + (0.0,) * (level - 2) + (1.0,)
    got_r, got_p = W._wow_body_fused(
        pieces, layout, tail, zero, False, B3SPLINE, level,
        (1.0,) * (level + 1), dc, True)
    planes = decompose(img32, level, B3SPLINE, use_pallas=False)
    ref_r, ref_p = W._wow_body(
        planes, zero, False, B3SPLINE, level, (1.0,) * (level + 1),
        True, dc, False, True, False, 3.2, None, None, 0.0)
    scale = float(jnp.max(jnp.abs(ref_r)))
    assert float(jnp.max(jnp.abs(got_r - ref_r))) < 5e-6 * max(scale, 1)
    assert float(jnp.max(jnp.abs(got_p - ref_p))) < 5e-6 * max(scale, 1)


def test_wow_tail_deep_batched(rng, monkeypatch):
    """Batched (frame-stack) WOW body through the deep kernel computes
    per-frame statistics, matching per-frame XLA bodies."""
    from wavelets_tpu.core.transform import decompose, decompose_pieces

    monkeypatch.setattr(pallas_conv, "plan_groups",
                        lambda H, w, level, hw, itemsize=4:
                        ([(0, 2)], level - 2))
    stack = jnp.asarray(
        rng.normal(size=(2, 512, 512)).astype(np.float32))
    stack = stack * jnp.asarray([1.0, 2.5], jnp.float32)[:, None, None]
    level = 7
    pieces, layout, tail = decompose_pieces(
        stack, level, B3SPLINE, axes=(1, 2), use_pallas=True,
        defer_tail=True)
    zero = jnp.zeros((2,), jnp.float32)
    dc = (5.0, 2.0) + (0.0,) * (level - 2) + (1.0,)
    got_r, got_p = W._wow_body_fused(
        pieces, layout, tail, zero, False, B3SPLINE, level,
        (1.0,) * (level + 1), dc, True)
    assert got_p.shape == (2, level + 1, 512, 512)
    for b in range(2):
        planes = decompose(stack[b], level, B3SPLINE, use_pallas=False)
        ref_r, ref_p = W._wow_body(
            planes, jnp.zeros(()), False, B3SPLINE, level,
            (1.0,) * (level + 1), True, dc, False, True, False, 3.2,
            None, None, 0.0, rops=W.VmapSafeReduceOps())
        scale = float(jnp.max(jnp.abs(ref_r)))
        assert float(jnp.max(jnp.abs(got_r[b] - ref_r))) < 5e-6 * scale
        assert float(jnp.max(jnp.abs(got_p[b] - ref_p))) < 5e-6 * scale


def test_deep_step_no_accum(img32):
    """recon=None selects the plane-only kernel layout: white/carry
    bitwise-match the accumulating call, recon' comes back None."""
    x = img32[None]
    recon = jnp.zeros_like(x)
    w1, r1, c1 = deep_whiten_step(
        x, recon, jnp.zeros((1,)), sf=B3SPLINE, scale=6, weight=1.0,
        masked=False, interpret=True)
    w2, r2, c2 = deep_whiten_step(
        x, None, jnp.zeros((1,)), sf=B3SPLINE, scale=6, weight=1.0,
        masked=False, interpret=True)
    assert r2 is None
    assert np.array_equal(np.asarray(w1), np.asarray(w2))
    assert np.array_equal(np.asarray(c1), np.asarray(c2))


def test_deep_step_nonring_geometry(rng):
    """H not divisible by the dilation falls back to the BlockSpec
    nine-window kernel; keep it covered now that square sizes take the
    stream path."""
    img = jnp.asarray(rng.normal(size=(576, 512)).astype(np.float32))
    s = 7
    assert 576 % (1 << s) != 0  # stream requires H % D == 0
    x = img[None]
    assert can_deep(x, B3SPLINE, s, None)
    white, r_out, cn = deep_whiten_step(
        x, jnp.zeros_like(x), jnp.zeros((1,)), sf=B3SPLINE, scale=s,
        weight=1.0, masked=False, interpret=True)
    ref_w, ref_c = _ref_step(img, s)
    assert_ulp(cn[0], ref_c)
    d = float(jnp.abs(white[0] - ref_w).max())
    scale = float(jnp.abs(ref_w).max())
    assert d < 5e-6 * max(scale, 1)


@pytest.mark.parametrize("s", [6, 7])
def test_deep_whiten_plane_matches_xla(img32, s):
    """Power-only kernel (materialized plane, coefficients-reuse deep
    scales) vs the XLA whiten_detail expression."""
    from wavelets_tpu.ops.pallas_deep import (can_deep_plane,
                                              deep_whiten_plane)

    assert can_deep_plane(img32[None], B3SPLINE, s)
    white = deep_whiten_plane(
        img32[None], jnp.zeros((1,)), sf=B3SPLINE, scale=s, weight=1.5,
        masked=False, interpret=True)

    @jax.jit
    def ref(c):
        lp = smooth(c * c, B3SPLINE, scale=s)
        lp = jnp.sqrt(jnp.where(lp <= 0, jnp.float32(1e-15), lp))
        return c * (1.5 / lp)

    ref_w = ref(img32)
    d = float(jnp.abs(white[0] - ref_w).max())
    scale = float(jnp.abs(ref_w).max())
    assert d < 5e-6 * max(scale, 1)


def test_deep_whiten_plane_masked(rng):
    from wavelets_tpu.ops.stats import significance
    from wavelets_tpu.ops.pallas_deep import deep_whiten_plane

    stack = jnp.asarray(rng.normal(size=(2, 512, 512)).astype(np.float32))
    thr = jnp.asarray([0.7, 0.0], jnp.float32)
    for soft in (True, False):
        white = deep_whiten_plane(
            stack, thr, sf=B3SPLINE, scale=6, weight=2.0, soft=soft,
            masked=True, interpret=True)
        for b in range(2):
            c = stack[b]
            lp = smooth(c * c, B3SPLINE, scale=6)
            lp = jnp.sqrt(jnp.where(lp <= 0, jnp.float32(1e-15), lp))
            t = float(thr[b])
            m = c
            if t != 0:
                if soft:
                    m = c * jax.scipy.special.erf(jnp.abs(c) / t)
                else:
                    m = c * (jnp.abs(c) > t).astype(jnp.float32)
            ref_w = m * (2.0 / lp)
            d = float(jnp.abs(white[b] - ref_w).max())
            scale = float(jnp.abs(ref_w).max())
            assert d < 5e-6 * max(scale, 1), (b, soft, d)


def test_can_deep_plane_gates():
    from wavelets_tpu.ops.pallas_deep import can_deep_plane

    x = jnp.zeros((1, 512, 512), jnp.float32)
    assert can_deep_plane(x, B3SPLINE, 6)
    assert can_deep_plane(x, B3SPLINE, 7)       # 2hw*D == H edge
    assert can_deep_plane(x, B3SPLINE, 4)       # Rc = 32 floor
    assert not can_deep_plane(x, B3SPLINE, 8)   # double bounce
    assert not can_deep_plane(x, B3SPLINE, 3)   # Rc = 16: roll hazard
    assert not can_deep_plane(x.astype(jnp.float64), B3SPLINE, 6)
    assert not can_deep_plane(
        jnp.zeros((1, 500, 512), jnp.float32), B3SPLINE, 6)  # H % D


def test_deep_bilateral_step_vs_xla(rng):
    """Fused bilateral deep step vs the XLA chain (local_variance +
    atrous_conv_nd + power smooth) — the _deep_tail_scales bilateral
    dispatch, watroo/wavelets.py:74-105 semantics at deep dilations.
    Tolerance (not bitwise): the tap partial sums regroup additions
    and exp differs in ulps."""
    from wavelets_tpu.core.transform import _smooth_step
    from wavelets_tpu.ops.pallas_deep import (can_deep_bilateral,
                                              deep_bilateral_whiten_step)

    x = jnp.asarray(rng.normal(size=(512, 512)).astype(np.float32))
    s = 4
    sigma = 1.5
    assert can_deep_bilateral(x[None], B3SPLINE, s)
    bil = (0.0,) * s + (sigma,) + (0.0,)
    for scaling in (False, True):
        c_next_ref = _smooth_step(x, s, B3SPLINE, (0, 1), "symmetric",
                                  bil, scaling)
        c = x - c_next_ref
        lp = smooth(c * c, B3SPLINE, scale=s)
        lp = jnp.sqrt(jnp.where(lp <= 0, jnp.float32(1e-15), lp))
        ref_w = c * (1.0 / lp)
        vf = sigma ** 2 * ((s + 1) if scaling else 1)
        white, cn = deep_bilateral_whiten_step(
            x[None], jnp.zeros((1,)), sf=B3SPLINE, scale=s,
            var_factor=vf, weight=1.0, masked=False, interpret=True)
        dc = float(jnp.abs(cn[0] - c_next_ref).max())
        dw = float(jnp.abs(white[0] - ref_w).max())
        sc = float(jnp.abs(ref_w).max())
        assert dc < 5e-6 * max(float(jnp.abs(c_next_ref).max()), 1), dc
        assert dw < 5e-6 * max(sc, 1), (scaling, dw)


def test_deep_bilateral_step_masked(rng):
    """Masked (denoised) bilateral deep step: erf / hard significance
    applied before whitening, per-frame thresholds."""
    from wavelets_tpu.core.transform import _smooth_step
    from wavelets_tpu.ops.pallas_deep import deep_bilateral_whiten_step

    stack = jnp.asarray(
        rng.normal(size=(2, 512, 512)).astype(np.float32))
    s = 4
    sigma = 2.0
    bil = (0.0,) * s + (sigma,) + (0.0,)
    thr = jnp.asarray([0.6, 0.0], jnp.float32)
    for soft in (True, False):
        white, cn = deep_bilateral_whiten_step(
            stack, thr, sf=B3SPLINE, scale=s, var_factor=sigma ** 2,
            weight=1.5, soft=soft, masked=True, interpret=True)
        for b in range(2):
            c_next = _smooth_step(stack[b], s, B3SPLINE, (0, 1),
                                  "symmetric", bil, False)
            c = stack[b] - c_next
            lp = smooth(c * c, B3SPLINE, scale=s)
            lp = jnp.sqrt(jnp.where(lp <= 0, jnp.float32(1e-15), lp))
            t = float(thr[b])
            m = c
            if t != 0:
                if soft:
                    m = c * jax.scipy.special.erf(jnp.abs(c) / t)
                else:
                    m = c * (jnp.abs(c) > t).astype(jnp.float32)
            ref_w = m * (1.5 / lp)
            dw = float(jnp.abs(white[b] - ref_w).max())
            sc = float(jnp.abs(ref_w).max())
            assert dw < 5e-6 * max(sc, 1), (b, soft, dw)


def test_can_deep_bilateral_gates():
    from wavelets_tpu.ops.pallas_deep import can_deep_bilateral

    x = jnp.zeros((1, 512, 512), jnp.float32)
    assert can_deep_bilateral(x, B3SPLINE, 4)
    assert can_deep_bilateral(x, B3SPLINE, 6)
    assert not can_deep_bilateral(x, B3SPLINE, 3)   # Rc = 16
    assert not can_deep_bilateral(x, B3SPLINE, 8)   # double bounce
    assert not can_deep_bilateral(x.astype(jnp.float64), B3SPLINE, 4)
    assert not can_deep_bilateral(
        jnp.zeros((1, 512, 500), jnp.float32), B3SPLINE, 4)  # W % 128


# ---- fused scale pair (deep_whiten_step2, round 4) --------------------

from wavelets_tpu.ops.pallas_deep import can_deep2, deep_whiten_step2


def _ref_pair(carry, s, weights=(1.0, 1.0), thresholds=(0.0, 0.0),
              soft=True):
    w1, c1 = _ref_step(carry, s, weights[0], thresholds[0], soft)
    w2, c2 = _ref_step(c1, s + 1, weights[1], thresholds[1], soft)
    return w1, w2, c2


@pytest.mark.parametrize("s", [4, 5])
def test_deep_step2_matches_xla(img32, s):
    x = img32[None]
    assert can_deep2(x, B3SPLINE, s, None)
    w1, w2, r_out, cn = deep_whiten_step2(
        x, None, jnp.zeros((2, 1)), sf=B3SPLINE, scale=s,
        weights=(1.0, 1.0), masked=(False, False), interpret=True)
    assert r_out is None
    ref1, ref2, ref_c = _ref_pair(img32, s)
    assert_ulp(cn[0], ref_c, ulps=8)  # two chained smooths
    for got, ref in ((w1[0], ref1), (w2[0], ref2)):
        d = float(jnp.abs(got - ref).max())
        scale = float(jnp.abs(ref).max())
        assert d < 5e-6 * max(scale, 1)


def test_deep_step2_matches_chained_singles(img32):
    """Pair == two chained single-scale stream launches (same folds)."""
    s = 4
    x = img32[None]
    w1p, w2p, _, cn2 = deep_whiten_step2(
        x, None, jnp.zeros((2, 1)), sf=B3SPLINE, scale=s,
        weights=(1.5, 0.5), masked=(False, False), interpret=True)
    wa, _, ca = deep_whiten_step(
        x, None, jnp.zeros((1,)), sf=B3SPLINE, scale=s, weight=1.5,
        masked=False, interpret=True)
    wb, _, cb = deep_whiten_step(
        ca, None, jnp.zeros((1,)), sf=B3SPLINE, scale=s + 1, weight=0.5,
        masked=False, interpret=True)
    assert_ulp(cn2, cb, ulps=8)
    assert_ulp(w1p, wa, ulps=8)
    sc = float(jnp.abs(wb).max())
    assert float(jnp.abs(w2p - wb).max()) < 5e-6 * max(sc, 1)


def test_deep_step2_masked_per_frame(rng):
    stack = jnp.asarray(
        rng.normal(size=(2, 512, 512)).astype(np.float32))
    thr = jnp.asarray([[0.5, 0.0], [0.3, 0.7]], jnp.float32).T  # (2, B)
    for soft in (True, False):
        w1, w2, _, cn = deep_whiten_step2(
            stack, None, thr, sf=B3SPLINE, scale=4, weights=(2.0, 1.2),
            soft=soft, masked=(True, True), interpret=True)
        for b in range(2):
            ref1, ref2, ref_c = _ref_pair(
                stack[b], 4, (2.0, 1.2),
                (float(thr[0, b]), float(thr[1, b])), soft)
            assert_ulp(cn[b], ref_c, ulps=8)
            for got, ref in ((w1[b], ref1), (w2[b], ref2)):
                d = float(jnp.abs(got - ref).max())
                scale = float(jnp.abs(ref).max())
                assert d < 5e-6 * max(scale, 1), (b, soft, d)


def test_deep_step2_accum_serving(img32):
    """write_plane=False + in-kernel recon accumulation (serving)."""
    x = img32[None]
    recon = x * 0.25
    w1, w2, r_out, cn = deep_whiten_step2(
        x, recon, jnp.zeros((2, 1)), sf=B3SPLINE, scale=4,
        weights=(1.0, 1.0), masked=(False, False), write_plane=False,
        interpret=True)
    assert w1 is None and w2 is None
    w1b, w2b, _, cnb = deep_whiten_step2(
        x, None, jnp.zeros((2, 1)), sf=B3SPLINE, scale=4,
        weights=(1.0, 1.0), masked=(False, False), interpret=True)
    assert np.array_equal(np.asarray(cn), np.asarray(cnb))
    ref = recon + (w1b + w2b)
    sc = float(jnp.abs(ref).max())
    assert float(jnp.abs(r_out - ref).max()) < 5e-6 * max(sc, 1)


def test_can_deep2_gates(img32):
    x = img32[None]
    assert can_deep2(x, B3SPLINE, 4, None)
    assert not can_deep2(x, B3SPLINE, 6, None)   # M = 8 < 5hw+1
    assert not can_deep2(x, B3SPLINE, 3, None)   # Rc = 16 < 32
    assert not can_deep2(x, B3SPLINE, 4, (1.0,) * 6)  # bilateral
    assert not can_deep2(x.astype(jnp.float64), B3SPLINE, 4, None)


def test_deep_step2_triangle_hw1(rng):
    """Generic-hw ring math: Triangle (hw=1) pair at s=5."""
    from wavelets_tpu.ops.filters import TRIANGLE

    img = jnp.asarray(rng.normal(size=(512, 512)).astype(np.float32))
    assert can_deep2(img[None], TRIANGLE, 5, None)
    w1, w2, _, cn = deep_whiten_step2(
        img[None], None, jnp.zeros((2, 1)), sf=TRIANGLE, scale=5,
        weights=(1.0, 1.0), masked=(False, False), interpret=True)
    c1 = smooth(img, TRIANGLE, scale=5)
    c2 = smooth(c1, TRIANGLE, scale=6)
    assert_ulp(cn[0], c2, ulps=8)
    lp1 = jnp.sqrt(jnp.maximum(
        smooth((img - c1) ** 2, TRIANGLE, scale=5), 1e-15))
    ref1 = (img - c1) / lp1
    assert float(jnp.abs(w1[0] - ref1).max()) < 5e-6
