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
sigma = 1.0
for s in (6, 7, 8, 9):
    bil = (0.0,) * s + (sigma,) + (0.0,)
    cn_ref = _smooth_step(x4, s, B3SPLINE, (0, 1), "symmetric", bil, False)
    c = x4 - cn_ref
    lp = smooth(c * c, B3SPLINE, scale=s)
    lp = jnp.sqrt(jnp.where(lp <= 0, jnp.float32(1e-15), lp))
    ref_w = c * (1.0 / lp)
    white, cn = pallas_deep.deep_bilateral_whiten_step(
        x4[None], jnp.zeros((1,)), sf=B3SPLINE, scale=s,
        var_factor=sigma ** 2, weight=1.0, masked=False)
    dc = float(jnp.abs(cn[0] - cn_ref).max())
    dw = float(jnp.abs(white[0] - ref_w).max())
    print(f"s={s} carry_err={dc:.2e} white_err={dw:.2e}", flush=True)

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

for s in (6, 9):
    f = jax.jit(lambda v, s=s: pallas_deep.deep_bilateral_whiten_step(
        v, jnp.zeros((1,)), sf=B3SPLINE, scale=s, var_factor=1.0,
        weight=1.0, masked=False)[1])
    dt = timeit_on(f, x4[None], iters=15)
    print(f"bilateral deep step s={s}: {dt*1e3:.2f} ms", flush=True)

one = jnp.ones((), jnp.float32)
nb, wb, db, sb = W.normalize_wow_params(
    B3SPLINE, None, [], [5.0, 2.0], 1, 0.0, 2, 4096)
stb = dict(sf=B3SPLINE, n_scales=nb, weights=wb, whitening=True,
           denoise_coefficients=db, bilateral=sb,
           bilateral_scaling=False, soft_threshold=True,
           preserve_variance=False, gamma=3.2, gamma_min=None,
           gamma_max=None, h=0.0, has_noise=True)
f = jax.jit(lambda a: W.wow_core(a, one, planes_layout="rows", **stb)[0])
fx = jax.jit(lambda a: W.wow_core(a, one, planes_layout="rows",
                                  fuse=False, **stb)[0])
r_f = f(x4); r_x = fx(x4)
err = float(jnp.abs(r_f - r_x).max()); sc = float(jnp.abs(r_x).max())
print(f"bilateral L10 fuse-vs-xla rel err: {err/max(sc,1e-9):.2e}", flush=True)
dt = timeit_on(f, x4)
print(f"wow 4k bilateral L{nb}: {dt*1e3:.2f} ms = {1/dt:.1f} fps", flush=True)
print("DONE", flush=True)
