#!/usr/bin/env python
"""Round-4: stage-level timing breakdown of the 4k L10 WOW headline,
planes and serving modes, against the per-stage HBM traffic floors.

Decides where the remaining wall-clock goes (verdict item 3: either
serving >= 200 fps or a committed breakdown).  Run on the TPU from the
repo root: python scripts/r4_breakdown.py"""
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
MOVE = 4096 * 4096 * 4 / 383e9 * 1e3  # ms per image move at the
# measured XLA copy ceiling (perf_probe.py: 383 GB/s read+write mix)


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
SKIP_EARLY = bool(int(__import__("os").environ.get("R4_SKIP_EARLY", "0")))
n_fast = W._deep_start(x4k, B3SPLINE)
groups, covered = pallas_conv.plan_wow_prefix(H, Wd, n_fast, 2, 4)
print(f"deep_start={n_fast} groups={groups} covered={covered}",
      flush=True)

# ---- merged group prefix, planes vs serving -------------------------
for need in (True, False) if not SKIP_EARLY else ():
    @jax.jit
    def mg(v, need=need):
        cur = v
        acc = None
        outs = []
        for off, g in groups:
            fac = jnp.ones((g,), jnp.float32)
            thr = jnp.zeros((g, 1), jnp.float32)
            cube, a = pallas_conv._fused_wow_group(
                cur, fac, thr, g, B3SPLINE, offset=off, soft=True,
                masked=(False,) * g, need_cube=need)
            if need:
                outs.extend(cube[k] for k in range(g))
            cur = cube[g if need else 0]
            acc = a if acc is None else acc + a
        r = cur + acc
        for o in outs:
            r = r + o
        return r
    # floor: reads (amp~1.2) + per-group carry+acc writes + plane rows
    nmove = sum((1.25 + 2 + (g if need else 0)) for _, g in groups)
    dt = timeit(mg, x4k)
    print(f"merged prefix planes={need}: {dt:.2f} ms "
          f"(floor ~{nmove * MOVE:.2f} ms, {nmove:.1f} moves)",
          flush=True)

# ---- each deep scale, write_plane=True (planes mode shape) ----------
tot_deep = 0.0
for s in range(n_fast, L) if not SKIP_EARLY else ():
    @jax.jit
    def ds(v, s=s):
        white, _, cn = pallas_deep.deep_whiten_step(
            v[None], None, jnp.zeros((1,)), sf=B3SPLINE, scale=s,
            weight=1.0, soft=True, masked=False, write_plane=True)
        return cn[0] + white[0]
    D = 1 << s
    M = H // D
    ext = 8  # 4hw extension block fetches per residue class
    amp = (M + ext) / M
    nmove = amp + 2
    dt = timeit(ds, x4k)
    tot_deep += dt
    print(f"deep s={s} (T={pallas_deep._stream_rows(H, Wd, D)}): "
          f"{dt:.2f} ms (floor ~{nmove * MOVE:.2f} ms, "
          f"{nmove:.2f} moves)", flush=True)
print(f"deep tail total: {tot_deep:.2f} ms", flush=True)

# ---- glue: final sum + residual std ---------------------------------
n_ops = 1 + (L - n_fast)  # acc + whites
parts = [x4k * (1.0 + 0.01 * k) for k in range(n_ops)]


@jax.jit
def glue(v, *ps):
    # operands as args, not closure captures (captured device arrays
    # are inlined as HLO constants — 450 MB of compile request)
    lp = jnp.std(v)
    lp = jnp.where(lp <= 0, jnp.float32(1e-15), lp)
    r = v * (1.0 / lp)
    for p in ps:
        r = r + p
    return r


nmove = 1 + n_ops + 1 + 1  # resid std read + operand reads + write
dt = timeit(lambda v: glue(v, *parts), x4k * 0.5)
print(f"glue (std + {n_ops + 1}-operand sum): {dt:.2f} ms "
      f"(floor ~{nmove * MOVE:.2f} ms, {nmove} moves)", flush=True)

# ---- full pipeline --------------------------------------------------
st = dict(sf=B3SPLINE, n_scales=L, weights=(1.0,) * (L + 1),
          whitening=True, denoise_coefficients=(0.0,) * L + (1.0,),
          bilateral=None, bilateral_scaling=False, soft_threshold=True,
          preserve_variance=False, gamma=3.2, gamma_min=None,
          gamma_max=None, h=0.0, has_noise=False)
zero = jnp.zeros((), jnp.float32)
dt = timeit(jax.jit(
    lambda a: W.wow_core(a, zero, planes_layout="rows", **st)[0]), x4k)
print(f"wow 4k L10 planes: {dt:.2f} ms = {1e3 / dt:.1f} fps", flush=True)
dt = timeit(jax.jit(
    lambda a: W.wow_core(a, zero, need_planes=False, **st)[0]), x4k)
print(f"wow 4k L10 serving: {dt:.2f} ms = {1e3 / dt:.1f} fps",
      flush=True)

# ---- bf16 L10 (verdict item 8) --------------------------------------
xb = x4k.astype(jnp.bfloat16)
dt = timeit(jax.jit(
    lambda a: W.wow_core(a, zero, planes_layout="rows", **st)[0]), xb)
print(f"wow 4k L10 bf16 planes: {dt:.2f} ms = {1e3 / dt:.1f} fps",
      flush=True)
dt = timeit(jax.jit(
    lambda a: W.wow_core(a, zero, need_planes=False, **st)[0]), xb)
print(f"wow 4k L10 bf16 serving: {dt:.2f} ms = {1e3 / dt:.1f} fps",
      flush=True)
print("DONE", flush=True)
