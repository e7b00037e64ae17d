#!/usr/bin/env python
"""Round-4 kernel probe: grid-step overhead vs tile size.

The cost model (ops/pallas_conv.py) prices the off0 whiten group at
4k² as 256 grid steps x 6 us = 1.54 ms of pure per-step overhead on a
0.94 ms VPU / 0.71 ms HBM workload — i.e. the 13 MB VMEM budget
forces 256² tiles and the step count dominates.  This probe forces
larger (TH, TW) plans and larger deep-stream block heights T on
hardware to find the real optimum.  Run from the repo root on the TPU:
    python scripts/r4_tile_probe.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from wavelets_tpu.ops import pallas_conv, pallas_deep
from wavelets_tpu.ops.filters import B3SPLINE

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


# ---- whiten group (0, 4): forced tile plans -------------------------
g = 4
R = pallas_conv._wow_group_halo(2, 0, g)
orig_plan = pallas_conv._plan_tiles
base = orig_plan(4096, 4096, g, R, 4, whiten=True)
print(f"group (0,{g}) R={R} baseline plan: {base}", flush=True)

fac = jnp.ones((g,), jnp.float32)
thr = jnp.zeros((g, 1), jnp.float32)


def group_fn(need):
    @jax.jit
    def mg(v):
        cube, acc = pallas_conv._fused_wow_group(
            v, fac, thr, g, B3SPLINE, offset=0, soft=True,
            masked=(False,) * g, need_cube=need)
        r = cube[g if need else 0] + acc
        if need:
            for k in range(g):
                r = r + cube[k]
        return r
    return mg


import os
TILES = [base, (512, 256), (512, 512), (512, 1024),
         (1024, 512), (1024, 1024), (2048, 512)]
if os.environ.get("R4_TILES"):
    TILES = [tuple(map(int, t.split("x")))
             for t in os.environ["R4_TILES"].split(",")]
for TH, TW in TILES:
    pallas_conv._plan_tiles = lambda *a, _t=(TH, TW), **k: _t
    jax.clear_caches()
    for need in (True, False):
        vm = pallas_conv._vmem_bytes(TH, TW, g, R, 4, whiten=True,
                                     reuse=4096 // TW > 1) / 2**20
        steps = (4096 // TH) * (4096 // TW)
        try:
            dt = timeit(group_fn(need), x4k)
            print(f"group tiles=({TH},{TW}) planes={need}: {dt:.2f} ms"
                  f"  [steps={steps} est_vmem={vm:.1f}M]", flush=True)
        except Exception as e:
            print(f"group tiles=({TH},{TW}) planes={need}: FAIL "
                  f"[steps={steps} est_vmem={vm:.1f}M] "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
pallas_conv._plan_tiles = orig_plan
jax.clear_caches()

# ---- deep stream scales: forced block heights -----------------------
orig_rows = pallas_deep._stream_rows
zero1 = jnp.zeros((1,), jnp.float32)
for s in (6, 8, 9):
    D = 1 << s
    for T in (64, 128):
        if D % T or 4096 % T:
            continue
        pallas_deep._stream_rows = (
            lambda H, W, DD, _T=T: _T if DD % _T == 0 and H % _T == 0
            else orig_rows(H, W, DD))
        jax.clear_caches()

        @jax.jit
        def ds(v, s=s):
            white, _, cn = pallas_deep.deep_whiten_step(
                v[None], None, zero1, sf=B3SPLINE, scale=s,
                weight=1.0, soft=True, masked=False, write_plane=True)
            return cn[0] + white[0]

        try:
            dt = timeit(ds, x4k)
            print(f"deep s={s} T={T}: {dt:.2f} ms "
                  f"[~vmem {30 * T * 4096 * 4 / 2**20:.0f}M]",
                  flush=True)
        except Exception as e:
            print(f"deep s={s} T={T}: FAIL "
                  f"{str(e).splitlines()[0][:120]}", flush=True)
pallas_deep._stream_rows = orig_rows
jax.clear_caches()

# ---- fused scale pair vs two chained singles (deep_whiten_step2) ----
thr2 = jnp.zeros((2, 1), jnp.float32)
for s in (4, 6, 8):
    if not pallas_deep.can_deep2(x4k[None], B3SPLINE, s, None):
        print(f"pair s={s}: infeasible", flush=True)
        continue

    @jax.jit
    def dp(v, s=s):
        w1, w2, _, cn = pallas_deep.deep_whiten_step2(
            v[None], None, thr2, sf=B3SPLINE, scale=s,
            weights=(1.0, 1.0), masked=(False, False))
        return cn[0] + w1[0] + w2[0]

    @jax.jit
    def dsingles(v, s=s):
        wa, _, ca = pallas_deep.deep_whiten_step(
            v[None], None, zero1, sf=B3SPLINE, scale=s, weight=1.0,
            soft=True, masked=False, write_plane=True)
        wb, _, cb = pallas_deep.deep_whiten_step(
            ca, None, zero1, sf=B3SPLINE, scale=s + 1, weight=1.0,
            soft=True, masked=False, write_plane=True)
        return cb[0] + wa[0] + wb[0]

    d_par = float(jnp.abs(dp(x4k) - dsingles(x4k)).max())
    dt_p = timeit(dp, x4k)
    dt_s = timeit(dsingles, x4k)
    print(f"pair s={s},{s+1}: {dt_p:.2f} ms vs singles {dt_s:.2f} ms, "
          f"parity maxdiff {d_par:.2e}", flush=True)
print("DONE", flush=True)
