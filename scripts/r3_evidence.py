#!/usr/bin/env python
"""Round-3 evidence timings (verdict items 6-8): bilateral WOW at auto
scale count (single-frame 4k and 8k, batched 4x4k serving), the odd
(non-tile-divisible) 4k frame, the 3-D volume denoise, and the 1-D
transform.  Separate from scripts/tpu_check.py because the bilateral
and 8k compiles push the wall clock past tpu_check's budget.

Usage: cd /root/repo && python scripts/r3_evidence.py
(TPU session; one TPU process at a time; total runtime ~10-15 min.)"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import importlib
W = importlib.import_module("wavelets_tpu.models.wow")
from wavelets_tpu.core.transform import decompose
from wavelets_tpu.models.denoise import denoise_core
from wavelets_tpu.ops.filters import B3SPLINE

ssum = jax.jit(jnp.sum)


def timeit_on(fn, v, iters=10):
    z = fn(v)
    float(ssum(z))
    t0 = time.perf_counter()
    for _ in range(5):
        float(ssum(v))
    rtt = (time.perf_counter() - t0) / 5
    z = v
    t0 = time.perf_counter()
    for _ in range(iters):
        z = fn(z)
    float(ssum(z))
    return (time.perf_counter() - t0 - rtt) / iters


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    big = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
    one = jnp.ones((), jnp.float32)
    zero = jnp.zeros((), jnp.float32)
    float(ssum(big))

    # bilateral WOW at auto scale count (B3spline 2-D bilateral σ_e
    # table has 10 entries, watroo/wavelets.py:274-276): fused bilateral
    # decompose groups + XLA deferred tail (data-dependent taps keep the
    # deep scales on the XLA chain — DESIGN.md "Known gaps")
    nb, wb, db, sb = W.normalize_wow_params(
        B3SPLINE, None, [], [5.0, 2.0], 1, 0.0, 2, 4096)
    stb = dict(sf=B3SPLINE, n_scales=nb, weights=wb, whitening=True,
               denoise_coefficients=db, bilateral=sb,
               bilateral_scaling=False, soft_threshold=True,
               preserve_variance=False, gamma=3.2, gamma_min=None,
               gamma_max=None, h=0.0, has_noise=True)
    dt = timeit_on(jax.jit(
        lambda a: W.wow_core(a, one, planes_layout="rows", **stb)[0]),
        big)
    print(f"wow 4k bilateral L{nb}: {dt * 1e3:.2f} ms = {1 / dt:.1f} fps",
          flush=True)

    # batched bilateral serving: 4-frame 4k stack, L6, per-frame stats
    stack4 = jnp.stack([big, big * 0.5, big + 1.0, big * 2.0])
    fbs = jax.jit(lambda v: W.wow_stack(
        v, n_scales=6, bilateral=1, denoise_coefficients=[5, 2],
        with_coefficients=False)[0])
    dt = timeit_on(fbs, stack4, iters=5)
    print(f"wow_stack 4x4k bilateral L6 serving: {dt * 1e3:.2f} ms = "
          f"{4 / dt:.1f} fps", flush=True)

    # odd (non-tile-divisible) frame: padded merged groups + XLA tail
    sto = dict(stb, bilateral=None, has_noise=False,
               denoise_coefficients=(0.0,) * nb + (1.0,))
    xo = jnp.asarray(rng.normal(size=(4112, 4100)).astype(np.float32))
    dt = timeit_on(jax.jit(
        lambda a: W.wow_core(a, zero, planes_layout="rows", **sto)[0]),
        xo)
    print(f"wow 4112x4100 L10: {dt * 1e3:.2f} ms = {1 / dt:.1f} fps",
          flush=True)
    # odd frame at the north-star scale count (no deep tail: the merged
    # groups cover all six scales, so this isolates the pad overhead)
    sto6 = dict(sto, n_scales=6, weights=(1.0,) * 7,
                denoise_coefficients=(0.0,) * 6 + (1.0,))
    dt = timeit_on(jax.jit(
        lambda a: W.wow_core(a, zero, planes_layout="rows", **sto6)[0]),
        xo)
    print(f"wow 4112x4100 L6: {dt * 1e3:.2f} ms = {1 / dt:.1f} fps",
          flush=True)
    st6 = dict(sto6, n_scales=6)
    dt = timeit_on(jax.jit(
        lambda a: W.wow_core(a, zero, planes_layout="rows", **st6)[0]),
        big)
    print(f"wow 4096x4096 L6 (same config): {dt * 1e3:.2f} ms = "
          f"{1 / dt:.1f} fps", flush=True)

    # 3-D volume: 64x1024^2, 3-scale denoise (the reference's
    # first-class volume path, watroo/wavelets.py:46-64; XLA ops — the
    # Pallas kernels are 2-D/batched-2-D)
    vol = jnp.asarray(
        rng.normal(size=(64, 1024, 1024)).astype(np.float32))
    dn3 = jax.jit(lambda v: denoise_core(
        v, None, (5.0, 3.0, 2.0), B3SPLINE))
    dt = timeit_on(dn3, vol, iters=5)
    print(f"denoise 64x1024x1024 3-scale: {dt * 1e3:.2f} ms = "
          f"{1 / dt:.2f} vol/s", flush=True)

    # 1-D: 2^20-sample transform + synthesis round trip (boundary
    # auto-selects the scipy reflect-101 1-D semantics,
    # watroo/wavelets.py:66-69; XLA path)
    sig = jnp.asarray(rng.normal(size=(1 << 20,)).astype(np.float32))
    tr1 = jax.jit(lambda v: jnp.sum(decompose(v, 8, B3SPLINE), 0))
    dt = timeit_on(tr1, sig, iters=10)
    print(f"1-D 1M-sample L8 transform+synthesis: {dt * 1e3:.2f} ms",
          flush=True)

    # 8k bilateral (auto scale count clamps to the 10-entry table)
    big8 = jnp.asarray(
        rng.normal(size=(8192, 8192)).astype(np.float32))
    nb8, wb8, db8, sb8 = W.normalize_wow_params(
        B3SPLINE, None, [], [5.0, 2.0], 1, 0.0, 2, 8192)
    stb8 = dict(stb, n_scales=nb8, weights=wb8,
                denoise_coefficients=db8, bilateral=sb8)
    dt = timeit_on(jax.jit(
        lambda a: W.wow_core(a, one, planes_layout="rows", **stb8)[0]),
        big8, iters=5)
    print(f"wow 8k bilateral L{nb8}: {dt * 1e3:.2f} ms = {1 / dt:.1f} "
          f"fps", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
