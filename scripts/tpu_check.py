#!/usr/bin/env python
"""Hardware validation suite: run on the attached TPU (NOT under the CPU
test conftest).  Exercises every Pallas fast path against the XLA
reference semantics on-device and prints PASS/FAIL lines plus headline
timings.

Usage: cd /root/repo && python scripts/tpu_check.py
(One TPU process at a time; first compiles take minutes.)"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import importlib
W = importlib.import_module("wavelets_tpu.models.wow")
from wavelets_tpu.core.transform import decompose, decompose_pieces
from wavelets_tpu.ops.filters import B3SPLINE, TRIANGLE
from wavelets_tpu.ops.stats import _median_nonneg_pallas
from wavelets_tpu.ops import pallas_deep

ssum = jax.jit(jnp.sum)
failures = []


def check(name, ok):
    print(("PASS " if ok else "FAIL ") + name, flush=True)
    if not ok:
        failures.append(name)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(512, 512)).astype(np.float32))

    # fused decompose: bitwise vs XLA
    for sf, L in [(B3SPLINE, 6), (TRIANGLE, 4), (B3SPLINE, 8)]:
        ref = decompose(x, L, sf, use_pallas=False)
        got = decompose(x, L, sf, use_pallas=True)
        check(f"decompose bitwise {sf.name} L{L}",
              bool((np.asarray(got) == np.asarray(ref)).all()))

    # fused whiten (pieces/layout form) vs XLA body
    planes = decompose(x, 6, B3SPLINE, use_pallas=False)
    ref_r, ref_p = W._wow_body(planes, jnp.zeros(()), False, B3SPLINE,
                               6, (1.0,) * 7, True,
                               (5., 2., 0., 0., 0., 0., 1.), False,
                               True, False, 3.2, None, None, 0.0)
    pieces, layout, tail = decompose_pieces(x, 6, B3SPLINE,
                                            defer_tail=True)
    got_r, got_p = W._wow_body_fused(pieces, layout, tail, jnp.zeros(()),
                                     False, B3SPLINE, 6, (1.0,) * 7,
                                     (5., 2., 0., 0., 0., 0., 1.), True)
    err = max(float(jnp.abs(got_r - ref_r).max()),
              float(jnp.abs(got_p - ref_p).max()))
    check(f"fused whiten err={err:.2e}", err < 5e-5)

    # deep whiten step: carry chain bitwise vs XLA, white within a ulp
    from wavelets_tpu.ops.conv import smooth
    from wavelets_tpu.ops.pallas_deep import deep_whiten_step

    @jax.jit
    def ref_step(v):
        c_next = smooth(v, B3SPLINE, scale=6)
        c = v - c_next
        lp = smooth(c * c, B3SPLINE, scale=6)
        lp = jnp.sqrt(jnp.where(lp <= 0, jnp.asarray(1e-15, c.dtype),
                                lp))
        return c * (1.0 / lp), c_next

    rw, rc = ref_step(x)
    white, _, cn = deep_whiten_step(
        x[None], jnp.zeros((1, 512, 512), jnp.float32), jnp.zeros((1,)),
        sf=B3SPLINE, scale=6, weight=1.0, masked=False)
    check("deep step carry bitwise s=6",
          bool(jnp.all(cn[0] == rc)))
    errw = float(jnp.abs(white[0] - rw).max())
    check(f"deep step white err={errw:.2e}", errw < 5e-6)

    # ring deep step at a deeper scale (class-ordered manual-DMA ring)
    x1k = jnp.asarray(rng.normal(size=(1024, 1024)).astype(np.float32))

    @jax.jit
    def ref_carry8(v):
        return smooth(v, B3SPLINE, scale=8)

    _, _, cn8 = deep_whiten_step(
        x1k[None], jnp.zeros((1, 1024, 1024), jnp.float32),
        jnp.zeros((1,)), sf=B3SPLINE, scale=8, weight=1.0, masked=False)
    check("ring deep carry bitwise s=8",
          bool(jnp.all(cn8[0] == ref_carry8(x1k))))

    # column-halo reuse: several column tiles, bitwise vs XLA
    xw = jnp.asarray(rng.normal(size=(512, 1536)).astype(np.float32))
    refw = decompose(xw, 5, B3SPLINE, use_pallas=False)
    gotw = decompose(xw, 5, B3SPLINE, use_pallas=True)
    check("decompose column-reuse bitwise 512x1536",
          bool((np.asarray(gotw) == np.asarray(refw)).all()))

    # merged decompose+whiten: need_planes=False leaves recon bitwise
    r1, _ = W._wow_body_merged(
        x, jnp.ones(()), True, B3SPLINE, 6, (1.0,) * 7,
        (5., 2., 0., 0., 0., 0., 1.), True)
    r2, none = W._wow_body_merged(
        x, jnp.ones(()), True, B3SPLINE, 6, (1.0,) * 7,
        (5., 2., 0., 0., 0., 0., 1.), True, need_planes=False)
    check("merged need_planes recon bitwise",
          none is None and bool(jnp.all(r1 == r2)))

    # batched preserve_variance rides the fused whiten (per-frame
    # factor table) — compare against a vmap of the XLA body
    stack = jnp.stack([x, 2.0 * x + 1.0])
    rs, ps = W.wow_stack(stack, preserve_variance=True,
                         n_scales=4, denoise_coefficients=[5, 2])

    def one_pv(frame):
        planes = decompose(frame, 4, B3SPLINE, use_pallas=False)
        return W._wow_body(
            planes, jnp.zeros(()), False, B3SPLINE, 4, (1.0,) * 5,
            True, (5., 2., 0., 0., 1.), False, True, True, 3.2,
            None, None, 0.0, rops=W.VmapSafeReduceOps())

    ref_rs, _ = jax.vmap(one_pv)(stack)
    errpv = float(jnp.abs(rs - ref_rs).max())
    check(f"batched preserve_variance err={errpv:.2e}", errpv < 5e-5)

    # exact median
    a = jnp.abs(jnp.asarray(
        rng.normal(size=(1024 * 1024,)).astype(np.float32)))
    m = float(_median_nonneg_pallas(a))
    check("pallas median exact",
          m == float(np.median(np.asarray(a))))

    # ---- round 5 paths -------------------------------------------------
    # 3-D volume fast path (axial XLA + in-plane fused kernels) bitwise
    from wavelets_tpu.core.transform import decompose as _dec
    from wavelets_tpu.ops.pallas_conv import fused_volume_decompose

    vol = jnp.asarray(rng.normal(size=(16, 512, 512)).astype(np.float32))
    got_v = fused_volume_decompose(vol, 3, B3SPLINE)
    ref_v = _dec(vol, 3, B3SPLINE, use_pallas=False)
    check("volume fast path bitwise",
          np.array_equal(np.asarray(got_v), np.asarray(ref_v)))

    # ragged (odd-shape) whiten group: recon vs XLA at f32 tolerance,
    # ragged outputs land unpadded
    xo = jnp.asarray(rng.normal(size=(600, 584)).astype(np.float32))
    sto = dict(sf=B3SPLINE, n_scales=4, weights=(1.0,) * 5,
               whitening=True, denoise_coefficients=(0.0,) * 5,
               bilateral=None, bilateral_scaling=False,
               soft_threshold=True, preserve_variance=False, gamma=3.2,
               gamma_min=None, gamma_max=None, h=0.0, has_noise=True)
    zo = jnp.zeros((), jnp.float32)
    r_of, p_of = W.wow_core(xo, zo, planes_layout="rows", **sto)
    r_ox, _ = W.wow_core(xo, zo, fuse=False, **sto)
    err_o = float(jnp.abs(r_of - r_ox).max())
    sc_o = float(jnp.abs(r_ox).max())
    check(f"odd-shape ragged wow err={err_o:.2e}",
          err_o < 5e-6 * max(sc_o, 1.0) and p_of[0].shape == xo.shape)

    # bf16 deep stream step vs f32 oracle on the bf16 carry
    from wavelets_tpu.ops.conv import smooth as _sm

    xb16 = jnp.asarray(
        rng.normal(size=(1, 2048, 2048)).astype(np.float32)
    ).astype(jnp.bfloat16)
    zero1 = jnp.zeros((1,), jnp.float32)
    wb, _, cnb = pallas_deep.deep_whiten_step(
        xb16, None, zero1, sf=B3SPLINE, scale=6, weight=1.0,
        soft=True, masked=False, write_plane=True)
    xf = xb16.astype(jnp.float32)
    cn_o = _sm(xf, B3SPLINE, scale=6, axes=(1, 2))
    c_o = xf - cn_o
    lp_o = _sm(c_o * c_o, B3SPLINE, scale=6, axes=(1, 2))
    w_o = c_o / jnp.sqrt(jnp.where(lp_o <= 0, 1e-15, lp_o))
    err_b = float(jnp.abs(wb.astype(jnp.float32) - w_o).max())
    check(f"bf16 deep stream err={err_b:.2e}", err_b < 5e-2)

    # halo-mode deep step bitwise vs reflection mode
    x1 = jnp.asarray(rng.normal(size=(1, 1024, 1024)).astype(np.float32))
    halo = 2 * B3SPLINE.half_width * (1 << 5)
    w_r, _, cn_r = pallas_deep.deep_whiten_step(
        x1, None, zero1, sf=B3SPLINE, scale=5, weight=1.0, soft=True,
        masked=False, write_plane=True)
    ext = jnp.pad(x1, ((0, 0), (halo, halo), (0, 0)), mode="symmetric")
    w_h, _, cn_h = pallas_deep.deep_whiten_step(
        ext, None, zero1, sf=B3SPLINE, scale=5, weight=1.0, soft=True,
        masked=False, write_plane=True, halo=halo)
    check("halo-mode deep step bitwise",
          np.array_equal(np.asarray(w_h), np.asarray(w_r))
          and np.array_equal(np.asarray(cn_h), np.asarray(cn_r)))

    # headline timing (4k L10 wow).  Chained iterations with ONE final
    # sync whose round trip (~28 ms through the axon tunnel!) is
    # measured separately and subtracted — the same methodology as
    # bench.py, so the numbers printed here agree with BENCH_r0N.json
    # to run-to-run noise (round 2 published a 10-iteration loop that
    # silently included one ~28 ms sync ⇒ +2.8 ms/iter).
    big = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
    float(ssum(big))

    def timeit(fn, iters=30):
        z = fn(big)
        float(ssum(z))
        t0 = time.perf_counter()
        for _ in range(10):
            float(ssum(big))
        rtt = (time.perf_counter() - t0) / 10
        z = big
        t0 = time.perf_counter()
        for _ in range(iters):
            z = fn(z)
        float(ssum(z))
        return (time.perf_counter() - t0 - rtt) / iters

    st = dict(sf=B3SPLINE, n_scales=10, weights=(1.0,) * 11,
              whitening=True,
              denoise_coefficients=(0.0,) * 10 + (1.0,),
              bilateral=None, bilateral_scaling=False,
              soft_threshold=True, preserve_variance=False, gamma=3.2,
              gamma_min=None, gamma_max=None, h=0.0, has_noise=False)
    zero = jnp.zeros((), jnp.float32)
    dt = timeit(jax.jit(
        lambda a: W.wow_core(a, zero, planes_layout="rows", **st)[0]))
    print(f"wow 4k L10: {dt * 1e3:.2f} ms = {1 / dt:.1f} fps", flush=True)
    check("wow 4k L10 under 10ms", dt < 0.010)

    dt = timeit(jax.jit(
        lambda a: W.wow_core(a, zero, need_planes=False, **st)[0]))
    print(f"wow 4k L10 serving: {dt * 1e3:.2f} ms = {1 / dt:.1f} fps",
          flush=True)
    check("wow 4k L10 serving under 10ms", dt < 0.010)

    # serving config timing (4k L6 known-noise, denoise [5,2])
    st6 = dict(st, n_scales=6, weights=(1.0,) * 7,
               denoise_coefficients=(5., 2., 0., 0., 0., 0., 1.),
               has_noise=True)
    one = jnp.ones((), jnp.float32)
    dt = timeit(jax.jit(
        lambda a: W.wow_core(a, one, planes_layout="rows", **st6)[0]))
    print(f"wow 4k L6 known-noise: {dt * 1e3:.2f} ms = {1 / dt:.1f} fps",
          flush=True)
    check("wow 4k L6 known-noise under 7ms", dt < 0.007)

    print(("ALL PASS" if not failures else
           f"{len(failures)} FAILURES: {failures}"), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
