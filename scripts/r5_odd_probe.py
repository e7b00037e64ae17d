#!/usr/bin/env python
"""Round-5 odd-shape overhead breakdown (verdict item 5: 4112x4100 L6
costs 48% over 4096^2 for 0.5% extra pixels).

Decomposes the overhead: the pad-in copy, the per-output crop copies
(planes mode crops g+2 arrays per group), the padded-deep pad/crops,
and the kernel-over-padded-area cost — then microtests whether Mosaic
accepts ragged (non-block-divisible) output shapes, which would let the
kernels write unpadded outputs directly and kill the crop copies.

Run on the TPU from the repo root:  python scripts/r5_odd_probe.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import importlib
W = importlib.import_module("wavelets_tpu.models.wow")
from wavelets_tpu.ops import pallas_conv
from wavelets_tpu.ops.filters import B3SPLINE

ssum = jax.jit(jnp.sum)
rng = np.random.default_rng(0)
xo = jnp.asarray(rng.normal(size=(4112, 4100)).astype(np.float32))
x4k = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
print("devices:", jax.devices(), flush=True)
float(ssum(x4k))


def timeit(fn, v, iters=10):
    z = fn(v)
    jax.tree.map(lambda a: float(jnp.asarray(a).ravel()[0]), z)
    t0 = time.perf_counter()
    for _ in range(5):
        float(v.ravel()[0])
    rtt = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    for _ in range(iters):
        z = fn(v)
    jax.tree.map(lambda a: float(jnp.asarray(a).ravel()[0]), z)
    return (time.perf_counter() - t0 - rtt) / iters * 1e3


# ---- end-to-end baselines -------------------------------------------
def l6(v, extent):
    n, w, d, _ = W.normalize_wow_params(B3SPLINE, 6, [], [], None,
                                        0.0, 2, extent)
    st = dict(sf=B3SPLINE, n_scales=n, weights=w, whitening=True,
              denoise_coefficients=d, bilateral=None,
              bilateral_scaling=False, soft_threshold=True,
              preserve_variance=False, gamma=3.2, gamma_min=None,
              gamma_max=None, h=0.0, has_noise=False)
    return jax.jit(lambda a: W.wow_core(
        a, jnp.zeros((), jnp.float32), planes_layout="rows", **st)[0])

print(f"wow L6 4096^2:    {timeit(l6(x4k, 4096), x4k):.3f} ms",
      flush=True)
print(f"wow L6 4112x4100: {timeit(l6(xo, 4100), xo):.3f} ms",
      flush=True)

# ---- group call in isolation ----------------------------------------
g = 4
fac = jnp.ones((g,), jnp.float32)
thr = jnp.zeros((g, 1), jnp.float32)


def group(v):
    cube, acc = pallas_conv._fused_wow_group(
        v, fac, thr, g, B3SPLINE, offset=0, soft=True,
        masked=(False,) * g, need_cube=True)
    r = acc + cube[g]
    for k in range(g):
        r = r + cube[k]
    return r

print(f"group(0,4) 4096^2:    {timeit(jax.jit(group), x4k):.3f} ms",
      flush=True)
print(f"group(0,4) 4112x4100: {timeit(jax.jit(group), xo):.3f} ms",
      flush=True)

# ---- pad / crop copies in isolation ---------------------------------
R = pallas_conv._wow_group_halo(2, 0, g)
TH, TW = pallas_conv._plan_tiles(4112, 4100, g, R, 4, whiten=True)
pt, _, Hp = pallas_conv._pad_split(4112, R, TH)
pj, _, Wp = pallas_conv._pad_split(4100, R, TW)
Rr, Rc = pallas_conv._aligned_halos(R)
print(f"odd plan: tiles=({TH},{TW}) padded=({Hp},{Wp}) "
      f"area x{Hp*Wp/4112/4100:.3f}", flush=True)

pad = jax.jit(lambda v: jnp.pad(
    v, ((Rr + pt, Rr + (Hp - 4112 - pt)),
        (Rc + pj, Rc + (Wp - 4100 - pj))), mode="symmetric"))
print(f"pad-in copy alone: {timeit(pad, xo):.3f} ms", flush=True)

big_padded = jnp.zeros((6, Hp, Wp), jnp.float32)
crop = jax.jit(lambda v: tuple(
    v[k, pt:pt + 4112, pj:pj + 4100] + 0.0 for k in range(6)))
print(f"6-plane crop copies alone: {timeit(crop, big_padded):.3f} ms",
      flush=True)

# ---- ragged-output microtest ----------------------------------------
# Can pallas write an output whose shape is NOT a multiple of the
# block? (If yes: emit unpadded planes directly, no crop copies.)
def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]

try:
    f = jax.jit(lambda v: pl.pallas_call(
        copy_kernel,
        grid=(pl.cdiv(4112, 1024), pl.cdiv(4100, 1024)),
        out_shape=jax.ShapeDtypeStruct((4112, 4100), jnp.float32),
        in_specs=[pl.BlockSpec((1024, 1024), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((1024, 1024), lambda i, j: (i, j)),
    )(v))
    z = f(xo)
    err = float(jnp.abs(z - xo).max())
    print(f"ragged output: OK maxdiff={err:.1e} "
          f"({timeit(f, xo):.3f} ms copy)", flush=True)
except Exception as e:
    print(f"ragged output: FAIL {str(e).splitlines()[0][:120]}",
          flush=True)

# ---- padded deep steps ----------------------------------------------
from wavelets_tpu.ops import pallas_deep

zero1 = jnp.zeros((1,), jnp.float32)
for s in (4, 5):
    plan = W._padded_deep_plan(xo.shape, xo.dtype, B3SPLINE, s)
    print(f"padded deep s={s}: plan={plan}", flush=True)
    if plan is None:
        continue
    Hp2, Wp2 = plan
    pt2 = (Hp2 - 4112) // 2
    pj2 = (Wp2 - 4100) // 2

    def dstep(v, s=s, Hp2=Hp2, Wp2=Wp2, pt2=pt2, pj2=pj2):
        cp = jnp.pad(v, ((pt2, Hp2 - 4112 - pt2),
                         (pj2, Wp2 - 4100 - pj2)), mode="symmetric")
        white, _, cb = pallas_deep.deep_whiten_step(
            cp[None], None, zero1, sf=B3SPLINE, scale=s, weight=1.0,
            soft=True, masked=False, write_plane=True)
        return (white[0, pt2:pt2 + 4112, pj2:pj2 + 4100]
                + cb[0, pt2:pt2 + 4112, pj2:pj2 + 4100])

    print(f"padded deep step s={s}: {timeit(jax.jit(dstep), xo):.3f} "
          "ms", flush=True)

    def dstep4k(v, s=s):
        white, _, cb = pallas_deep.deep_whiten_step(
            v[None], None, zero1, sf=B3SPLINE, scale=s, weight=1.0,
            soft=True, masked=False, write_plane=True)
        return white[0] + cb[0]

    print(f"plain deep step s={s} 4096^2: "
          f"{timeit(jax.jit(dstep4k), x4k):.3f} ms", flush=True)

print("DONE", flush=True)
