import sys, time; sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp
import importlib
W = importlib.import_module("wavelets_tpu.models.wow")
from wavelets_tpu.ops.filters import B3SPLINE
from wavelets_tpu.ops import pallas_deep
from wavelets_tpu.core.transform import _smooth_step
from wavelets_tpu.ops.conv import smooth
ssum = jax.jit(jnp.sum)
rng = np.random.default_rng(0)
x4 = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
float(ssum(x4))

def timeit_on(fn, v, iters=10):
    z = fn(v); float(ssum(z))
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

sigma = 1.0
for s in (6, 7, 8, 9):
    T = pallas_deep._bilateral_stream_rows(4096, 4096, 1 << s)
    bil = (0.0,) * s + (sigma,) + (0.0,)
    cn_ref = _smooth_step(x4, s, B3SPLINE, (0, 1), "symmetric", bil, False)
    white, cn = pallas_deep.deep_bilateral_whiten_step(
        x4[None], jnp.zeros((1,)), sf=B3SPLINE, scale=s,
        var_factor=sigma ** 2, weight=1.0, masked=False)
    dc = float(jnp.abs(cn[0] - cn_ref).max())
    f = jax.jit(lambda v, s=s: pallas_deep.deep_bilateral_whiten_step(
        v, jnp.zeros((1,)), sf=B3SPLINE, scale=s, var_factor=1.0,
        weight=1.0, masked=False)[1])
    dt = timeit_on(f, x4[None], iters=15)
    print(f"s={s} T={T}: {dt*1e3:.2f} ms carry_err={dc:.2e}", flush=True)

one = jnp.ones((), jnp.float32)
nb, wb, db, sb = W.normalize_wow_params(
    B3SPLINE, None, [], [5.0, 2.0], 1, 0.0, 2, 4096)
stb = dict(sf=B3SPLINE, n_scales=nb, weights=wb, whitening=True,
           denoise_coefficients=db, bilateral=sb,
           bilateral_scaling=False, soft_threshold=True,
           preserve_variance=False, gamma=3.2, gamma_min=None,
           gamma_max=None, h=0.0, has_noise=True)
f = jax.jit(lambda a: W.wow_core(a, one, planes_layout="rows", **stb)[0])
dt = timeit_on(f, x4)
print(f"wow 4k bilateral L{nb}: {dt*1e3:.2f} ms = {1/dt:.1f} fps", flush=True)
print("DONE", flush=True)
