"""Round-3: stage-level timing breakdown of the 4k L10 WOW headline.
Run on the TPU from the repo root: python scripts/r3_breakdown.py"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import importlib
W = importlib.import_module("wavelets_tpu.models.wow")
from wavelets_tpu.ops.filters import B3SPLINE
from wavelets_tpu.ops import pallas_conv, pallas_deep

ssum = jax.jit(jnp.sum)
rng = np.random.default_rng(0)
x4k = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
print("devices:", jax.devices(), flush=True)
float(ssum(x4k))


def timeit(fn, v, iters=20):
    z = fn(v)
    float(ssum(z))
    t0 = time.perf_counter()
    for _ in range(10):
        float(ssum(v))
    rtt = (time.perf_counter() - t0) / 10
    z = v
    t0 = time.perf_counter()
    for _ in range(iters):
        z = fn(z)
    float(ssum(z))
    return (time.perf_counter() - t0 - rtt) / iters * 1e3


H = Wd = 4096
L = 10
n_fast = W._deep_start(x4k, B3SPLINE)
print("deep_start:", n_fast, flush=True)
groups, covered = pallas_conv.plan_wow_groups(H, Wd, n_fast, 2, 4)
print(f"plan_wow_groups(4k, {n_fast}):", groups, "covered", covered,
      flush=True)

# merged groups timing, one at a time (cur chains via same-shape output)
for off, g in groups:
    fac = jnp.ones((g,), jnp.float32)
    thr = jnp.zeros((g, 1), jnp.float32)

    @jax.jit
    def mg(v, off=off, g=g, fac=fac, thr=thr):
        cube, acc = pallas_conv._fused_wow_group(
            v, fac, thr, g, B3SPLINE, offset=off, soft=True,
            masked=(False,) * g, need_cube=True)
        return cube[g] + 0 * acc
    print(f"merged group off={off} g={g}: {timeit(mg, x4k):.2f} ms",
          flush=True)

    @jax.jit
    def mg_nc(v, off=off, g=g, fac=fac, thr=thr):
        cube, acc = pallas_conv._fused_wow_group(
            v, fac, thr, g, B3SPLINE, offset=off, soft=True,
            masked=(False,) * g, need_cube=False)
        return cube[0] + 0 * acc
    print(f"  serving (need_cube=False): {timeit(mg_nc, x4k):.2f} ms",
          flush=True)

# deep steps, planes mode (accum=None) and serving mode
xb = x4k[None]
for s in range(n_fast, L):
    D = 1 << s
    T2 = pallas_deep._stream_rows(H, Wd, D)
    Tb = pallas_deep.deep_block_rows(H, Wd, D)
    print(f"s={s}: stream T={T2} (grid steps {H//T2 if T2 else 0}), "
          f"blockspec T={Tb}", flush=True)

    @jax.jit
    def dstep(v, s=s):
        w, r, c = pallas_deep.deep_whiten_step(
            v, None, jnp.zeros((1,)), sf=B3SPLINE, scale=s,
            weight=1.0, masked=False, write_plane=True)
        return c + 0 * w
    print(f"  planes mode: {timeit(dstep, xb):.2f} ms", flush=True)

    @jax.jit
    def dserve(v, s=s):
        w, r, c = pallas_deep.deep_whiten_step(
            v, jnp.zeros_like(v), jnp.zeros((1,)), sf=B3SPLINE,
            scale=s, weight=1.0, masked=False, write_plane=False)
        return c + 0 * r
    print(f"  serving mode: {timeit(dserve, xb):.2f} ms", flush=True)

# end-to-end L10
zero = jnp.zeros((), jnp.float32)
st = dict(sf=B3SPLINE, n_scales=L, weights=(1.0,) * (L + 1),
          whitening=True, denoise_coefficients=(0.0,) * L + (1.0,),
          bilateral=None, bilateral_scaling=False, soft_threshold=True,
          preserve_variance=False, gamma=3.2, gamma_min=None,
          gamma_max=None, h=0.0, has_noise=False)

f_rows = jax.jit(lambda v: W.wow_core(v, zero, planes_layout="rows",
                                      **st)[0])
print(f"wow_core L10 rows: {timeit(f_rows, x4k, 30):.2f} ms", flush=True)

f_serve = jax.jit(lambda v: W.wow_core(v, zero, need_planes=False,
                                       **st)[0])
print(f"wow_core L10 serving: {timeit(f_serve, x4k, 30):.2f} ms",
      flush=True)

# L6 north star (known noise + lazy)
st6 = dict(st, n_scales=6, weights=(1.0,) * 7,
           denoise_coefficients=(5.0, 2.0, 0.0, 0.0, 0.0, 0.0, 1.0),
           has_noise=True)
one = jnp.ones((), jnp.float32)
f6k = jax.jit(lambda v: W.wow_core(v, one, planes_layout="rows",
                                   **st6)[0])
print(f"wow L6 known-noise rows: {timeit(f6k, x4k, 30):.2f} ms",
      flush=True)
st6l = dict(st6, has_noise=False)
f6l = jax.jit(lambda v: W.wow_core(v, zero, planes_layout="rows",
                                   **st6l)[0])
print(f"wow L6 lazy-noise rows: {timeit(f6l, x4k, 30):.2f} ms",
      flush=True)
f6s = jax.jit(lambda v: W.wow_core(v, one, need_planes=False,
                                   **st6)[0])
print(f"wow L6 known-noise serving: {timeit(f6s, x4k, 30):.2f} ms",
      flush=True)
