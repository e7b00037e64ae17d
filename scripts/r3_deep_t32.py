#!/usr/bin/env python
"""Round-3 A/B: deep-step stream block height T=32 vs T=16 (the
_STREAM_BUDGET bump in ops/pallas_deep.py).  Times each deferred-tail
scale standalone plus the 4k L10 headline.  TPU session, repo root."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

import importlib
W = importlib.import_module("wavelets_tpu.models.wow")
from wavelets_tpu.ops import pallas_deep
from wavelets_tpu.ops.filters import B3SPLINE

ssum = jax.jit(jnp.sum)


def timeit_on(fn, v, iters=20):
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
    big = jnp.asarray(
        rng.normal(size=(1, 4096, 4096)).astype(np.float32))
    float(ssum(big))
    zero = jnp.zeros((1,), jnp.float32)

    for s in (4, 5, 6, 7, 8, 9):
        D = 1 << s
        T = pallas_deep._stream_rows(4096, 4096, D)
        f = jax.jit(lambda v, s=s: pallas_deep.deep_whiten_step(
            v, None, zero, sf=B3SPLINE, scale=s, weight=1.0,
            masked=False)[2])
        dt = timeit_on(f, big)
        print(f"s={s} T={T}: {dt * 1e3:.2f} ms", flush=True)

    x = big[0]
    st = dict(sf=B3SPLINE, n_scales=10, weights=(1.0,) * 11,
              whitening=True, denoise_coefficients=(0.0,) * 10 + (1.0,),
              bilateral=None, bilateral_scaling=False,
              soft_threshold=True, preserve_variance=False, gamma=3.2,
              gamma_min=None, gamma_max=None, h=0.0, has_noise=False)
    z = jnp.zeros((), jnp.float32)
    dt = timeit_on(jax.jit(
        lambda a: W.wow_core(a, z, planes_layout="rows", **st)[0]), x,
        iters=30)
    print(f"wow 4k L10 rows: {dt * 1e3:.2f} ms = {1 / dt:.1f} fps",
          flush=True)
    dt = timeit_on(jax.jit(
        lambda a: W.wow_core(a, z, need_planes=False, **st)[0]), x,
        iters=30)
    print(f"wow 4k L10 serving: {dt * 1e3:.2f} ms = {1 / dt:.1f} fps",
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

# odd-shape serving-mode probe (appended): isolates the plane-crop
# copies — serving mode emits recon only, so the padded group outputs
# that must be crop-copied drop from g+2 per group to 2
def extra():
    rng = np.random.default_rng(1)
    xo = jnp.asarray(rng.normal(size=(4112, 4100)).astype(np.float32))
    z = jnp.zeros((), jnp.float32)
    st6 = dict(sf=B3SPLINE, n_scales=6, weights=(1.0,) * 7,
               whitening=True, denoise_coefficients=(0.0,) * 6 + (1.0,),
               bilateral=None, bilateral_scaling=False,
               soft_threshold=True, preserve_variance=False, gamma=3.2,
               gamma_min=None, gamma_max=None, h=0.0, has_noise=False)
    dt = timeit_on(jax.jit(
        lambda a: W.wow_core(a, z, need_planes=False, **st6)[0]), xo)
    print(f"wow 4112x4100 L6 serving: {dt * 1e3:.2f} ms", flush=True)
    dt = timeit_on(jax.jit(
        lambda a: W.wow_core(a, z, planes_layout="rows", **st6)[0]), xo)
    print(f"wow 4112x4100 L6 rows: {dt * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    extra()
