"""Round-2 hardware timing batch (run on the TPU from the repo root).
One TPU process at a time; run: python scripts/r2_timing.py"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import importlib
W = importlib.import_module("wavelets_tpu.models.wow")
from wavelets_tpu.ops.filters import B3SPLINE
from wavelets_tpu.ops.conv import smooth
from wavelets_tpu.ops.pallas_deep import deep_whiten_step

ssum = jax.jit(jnp.sum)
rng = np.random.default_rng(0)
x4k = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
print("devices:", jax.devices(), flush=True)
float(ssum(x4k))
print("warm", flush=True)


def timeit(fn, v, iters=20):
    z = fn(v); float(ssum(z))
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


# 1. ring deep step: bitwise carry + per-scale timing at 4k
for s in (6, 7, 8, 9):
    xb = x4k[None]
    white, r_out, cn = deep_whiten_step(
        xb, jnp.zeros_like(xb), jnp.zeros((1,)), sf=B3SPLINE, scale=s,
        weight=1.0, masked=False)
    ref_c = jax.jit(lambda v, s=s: smooth(v, B3SPLINE, scale=s))(x4k)
    bit = bool(np.array_equal(np.asarray(cn[0]), np.asarray(ref_c)))
    print(f"ring s={s}: carry bitwise={bit}", flush=True)

    @jax.jit
    def step(v, s=s):
        w, r, c = deep_whiten_step(
            v, jnp.zeros_like(v), jnp.zeros((1,)), sf=B3SPLINE,
            scale=s, weight=1.0, masked=False)
        return c

    print(f"ring s={s}: {timeit(step, xb):.2f} ms/step", flush=True)

# 2. wow 4k L10 headline (merged + ring deep)
zero = jnp.zeros((), jnp.float32)
L = 10
st = dict(sf=B3SPLINE, n_scales=L, weights=(1.0,) * (L + 1),
          whitening=True, denoise_coefficients=(0.0,) * L + (1.0,),
          bilateral=None, bilateral_scaling=False, soft_threshold=True,
          preserve_variance=False, gamma=3.2, gamma_min=None,
          gamma_max=None, h=0.0, has_noise=False)
f = jax.jit(lambda v: W.wow_core(v, zero, **st)[0])
dt = timeit(f, x4k, iters=30)
print(f"wow 4k L10: {dt:.2f} ms = {1000/dt:.1f} fps", flush=True)

r_f = f(x4k)
fx = jax.jit(lambda v: W.wow_core(v, zero, fuse=False, **st)[0])
r_x = fx(x4k)
sc = float(jnp.abs(r_x).max())
print("L10 fused vs XLA max|d|: %.2e (scale %.1f)" % (
    float(jnp.abs(r_f - r_x).max()), sc), flush=True)

# 3. known-noise L6 (merged groups + reuse)
one = jnp.ones((), jnp.float32)
st_k = dict(st, n_scales=6, weights=(1.0,) * 7,
            denoise_coefficients=(5.0, 2.0, 0.0, 0.0, 0.0, 0.0, 1.0),
            has_noise=True)
fk = jax.jit(lambda v: W.wow_core(v, one, **st_k)[0])
dt = timeit(fk, x4k, iters=30)
print(f"wow 4k L6 known-noise: {dt:.2f} ms = {1000/dt:.1f} fps",
      flush=True)

# 4. need_planes=False serving variants
fnp = jax.jit(lambda v: W.wow_core(v, one, need_planes=False,
                                   **st_k)[0])
r1, r2 = fk(x4k), fnp(x4k)
print("L6 need_planes recon bitwise:",
      bool(jnp.all(r1 == r2)), flush=True)
dt = timeit(fnp, x4k, iters=30)
print(f"wow 4k L6 known-noise no-planes: {dt:.2f} ms = "
      f"{1000/dt:.1f} fps", flush=True)

fnp10 = jax.jit(lambda v: W.wow_core(v, zero, need_planes=False,
                                     **st)[0])
r10 = fnp10(x4k)
print("L10 need_planes recon bitwise:",
      bool(jnp.all(r10 == r_f)), flush=True)
dt = timeit(fnp10, x4k, iters=30)
print(f"wow 4k L10 no-planes: {dt:.2f} ms = {1000/dt:.1f} fps",
      flush=True)

# 5. lazy-noise L10 (bench config is has_noise=False but unmasked;
#    masked lazy exercises median in pipeline)
st_lazy = dict(st, n_scales=6, weights=(1.0,) * 7,
               denoise_coefficients=(5.0, 2.0, 0.0, 0.0, 0.0, 0.0, 1.0),
               has_noise=False)
fl = jax.jit(lambda v: W.wow_core(v, zero, **st_lazy)[0])
dt = timeit(fl, x4k, iters=30)
print(f"wow 4k L6 lazy-noise: {dt:.2f} ms = {1000/dt:.1f} fps",
      flush=True)

# 5b. lazy-noise through the merged body directly (gate A/B: the
# _can_merge_whiten lazy gate was tuned pre-reuse)
fm = jax.jit(lambda v: W._wow_body_merged(
    v, zero, False, B3SPLINE, 6, (1.0,) * 7,
    (5.0, 2.0, 0.0, 0.0, 0.0, 0.0, 1.0), True)[0])
dt = timeit(fm, x4k, iters=30)
print(f"wow 4k L6 lazy-noise MERGED-FORCED: {dt:.2f} ms = "
      f"{1000/dt:.1f} fps", flush=True)

# 6. 8k L10
x8k = jnp.asarray(rng.normal(size=(8192, 8192)).astype(np.float32))
st8 = dict(st, denoise_coefficients=(5.0, 2.0) + (0.0,) * 8 + (1.0,),
           has_noise=True)
f8 = jax.jit(lambda v: W.wow_core(v, one, **st8)[0])
dt = timeit(f8, x8k, iters=10)
print(f"wow 8k L10 known-noise: {dt:.2f} ms = {1000/dt:.1f} fps",
      flush=True)

# 7. wow_stack 4x4k serving with/without coefficients
stack = jnp.asarray(
    rng.normal(size=(4, 4096, 4096)).astype(np.float32))

def serve(with_c):
    def g(v):
        r, _ = W.wow_stack(v, denoise_coefficients=[5, 2], n_scales=6,
                           with_coefficients=with_c)
        return r
    return g

for wc in (True, False):
    g = serve(wc)
    dt = timeit(g, stack, iters=10)
    print(f"wow_stack 4x4k L6 with_coefficients={wc}: {dt:.2f} ms = "
          f"{4000/dt:.1f} fps", flush=True)

# 8. batched known-noise serving (merged path: stacks + need_planes=False)
def serve_kn(v):
    r, _ = W.wow_stack(v, noise=1.0, denoise_coefficients=[5, 2],
                       n_scales=6, with_coefficients=False)
    return r

dt = timeit(serve_kn, stack, iters=10)
print(f"wow_stack 4x4k L6 known-noise no-coeffs (merged): {dt:.2f} ms"
      f" = {4000/dt:.1f} fps", flush=True)

print("HW2-DONE", flush=True)

# 9. bf16 A/B: XLA path (current dispatch) vs forced merged kernels
xb16 = x4k.astype(jnp.bfloat16)
st_b = dict(st, n_scales=6, weights=(1.0,) * 7,
            denoise_coefficients=(5.0, 2.0, 0.0, 0.0, 0.0, 0.0, 1.0),
            has_noise=True)
one16 = jnp.ones((), jnp.bfloat16)
fb_xla = jax.jit(lambda v: W.wow_core(v, one16, **st_b)[0])
dt = timeit(fb_xla, xb16, iters=30)
print(f"bf16 4k L6 XLA path: {dt:.2f} ms = {1000/dt:.1f} fps",
      flush=True)
W.BF16_MERGED = True
try:
    fb_mg = jax.jit(lambda v: W._wow_body_merged(
        v, one16, True, B3SPLINE, 6, (1.0,) * 7,
        (5.0, 2.0, 0.0, 0.0, 0.0, 0.0, 1.0), True)[0])
    r_m = fb_mg(xb16)
    r_x = fb_xla(xb16)
    sc = float(jnp.abs(r_x.astype(jnp.float32)).max())
    print("bf16 merged vs XLA max|d|: %.3e (scale %.1f)" % (
        float(jnp.abs((r_m - r_x).astype(jnp.float32)).max()), sc),
        flush=True)
    dt = timeit(fb_mg, xb16, iters=30)
    print(f"bf16 4k L6 MERGED: {dt:.2f} ms = {1000/dt:.1f} fps",
          flush=True)
    fb_srv = jax.jit(lambda v: W._wow_body_merged(
        v, one16, True, B3SPLINE, 6, (1.0,) * 7,
        (5.0, 2.0, 0.0, 0.0, 0.0, 0.0, 1.0), True,
        need_planes=False)[0])
    dt = timeit(fb_srv, xb16, iters=30)
    print(f"bf16 4k L6 MERGED no-planes: {dt:.2f} ms = "
          f"{1000/dt:.1f} fps", flush=True)
finally:
    W.BF16_MERGED = False

print("HW2B-DONE", flush=True)
