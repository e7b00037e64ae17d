"""Worker snippet: validate v2 fused kernels on the real TPU.

Checks (bitwise/tolerance) the fused decompose pieces + whiten against
the XLA reference path, unbatched and batched, then times the headline
configs.  Run via scripts/tpu_worker.py.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from wavelets_tpu.ops.filters import B3SPLINE
from wavelets_tpu.core.transform import (
    decompose, decompose_pieces, assemble_pieces)
from wavelets_tpu.models.wow import wow_core

N = 4096


def sync(v):
    return float(jax.jit(jnp.sum)(jnp.ravel(v)[:1]))


x = jax.jit(lambda: jax.random.normal(
    jax.random.PRNGKey(0), (N, N), jnp.float32))()
sync(x)

# --- correctness: fused decompose pieces vs XLA, L10 ---
f_fused = jax.jit(lambda a: assemble_pieces(
    *decompose_pieces(a, 10, B3SPLINE)))
f_xla = jax.jit(lambda a: decompose(a, 10, B3SPLINE, use_pallas=False))
pf = f_fused(x)
px = f_xla(x)
d = float(jnp.max(jnp.abs(pf - px)))
print(f"decompose L10 fused vs XLA: max|diff| = {d:.3e}", flush=True)
assert d == 0.0, "fused decompose not bitwise"

# --- correctness: batched per-frame decompose (B=2, axes=(1,2)) ---
xb = jnp.stack([x, x[::-1]])
pb = jax.jit(lambda a: assemble_pieces(
    *decompose_pieces(a, 6, B3SPLINE, axes=(1, 2))))(xb)
p0 = jax.jit(lambda a: assemble_pieces(
    *decompose_pieces(a, 6, B3SPLINE)))(x)
d = float(jnp.max(jnp.abs(pb[:, 0] - p0)))
print(f"batched decompose vs single: max|diff| = {d:.3e}", flush=True)
assert d == 0.0

# --- correctness: wow_core fused vs unfused, known noise + lazy ---
zero = jnp.zeros((), jnp.float32)
one = jnp.ones((), jnp.float32)
for L in (6, 10):
    for dns, nz, lbl in ((tuple([0.0] * L + [1.0]), zero, "plain"),
                         ((5.0, 2.0) + tuple([0.0] * (L - 2) + [1.0]),
                          one, "denoise+noise")):
        st = dict(sf=B3SPLINE, n_scales=L, weights=(1.0,) * (L + 1),
                  whitening=True, denoise_coefficients=dns,
                  bilateral=None, bilateral_scaling=False,
                  soft_threshold=True, preserve_variance=False,
                  gamma=3.2, gamma_min=None, gamma_max=None, h=0.0,
                  has_noise=bool(nz is one))
        rf = jax.jit(lambda a, n: wow_core(a, n, fuse=True, **st))(x, nz)
        ru = jax.jit(lambda a, n: wow_core(a, n, fuse=False, **st))(x, nz)
        dr = float(jnp.max(jnp.abs(rf[0] - ru[0])))
        dp = float(jnp.max(jnp.abs(rf[1] - ru[1])))
        sc = float(jnp.max(jnp.abs(ru[0])))
        print(f"wow L{L} {lbl}: recon diff {dr:.3e} planes diff {dp:.3e}"
              f" (scale {sc:.2f})", flush=True)

# --- timing ---
def timeit(f, x, iters=10):
    out = f(x)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(5):
        sync(x)
    rtt = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(x)
    sync(out)
    return (time.perf_counter() - t0 - rtt) / iters


for L in (6, 10):
    st = dict(sf=B3SPLINE, n_scales=L, weights=(1.0,) * (L + 1),
              whitening=True,
              denoise_coefficients=tuple([0.0] * L + [1.0]),
              bilateral=None, bilateral_scaling=False,
              soft_threshold=True, preserve_variance=False,
              gamma=3.2, gamma_min=None, gamma_max=None, h=0.0,
              has_noise=False)
    f_recon = jax.jit(lambda a: wow_core(a, zero, **st)[0])
    dt = timeit(f_recon, x)
    print(f"wow_core L{L} recon-only: {dt*1e3:.2f} ms"
          f" ({1/dt:.1f} fps)", flush=True)
    f_both = jax.jit(lambda a: wow_core(a, zero, **st))
    dt = timeit(lambda a: f_both(a)[0], x)
    print(f"wow_core L{L} recon+planes: {dt*1e3:.2f} ms"
          f" ({1/dt:.1f} fps)", flush=True)
