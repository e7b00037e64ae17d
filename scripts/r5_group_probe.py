#!/usr/bin/env python
"""Round-5 whiten-group pipeline probe.

r5_fold_probe showed the fold passes themselves run at ~VPU peak
(6.2 us/pass/tile = 1.59 ms for the 16-pass mix incl. its own DMA under
BlockSpec pipelining), yet the production whiten group (0,4) measures
2.77/2.43 ms (planes/serving) — ~1 ms above fold+floor.  Hypothesis:
the production kernel's manual-DMA input path (overlapping windows,
ping-pong slots, column-halo reuse) pipelines worse than Mosaic's
BlockSpec scheduler.  This probe A/Bs:

  A  production _fused_wow_group (planes / serving)   [baseline]
  B  pre-tiled input + BlockSpec-pipelined whiten kernel: the
     overlapping (N, M) windows are materialized by an XLA slice-stack
     (~0.43 ms of copies at 4k) into a (T, N, M) array, then the kernel
     is pure BlockSpec in/out — Mosaic overlaps everything
  B' the same kernel timed WITHOUT the XLA pre-tiling cost (upper bound)
  C  B with per-scale minimal fold extents (creep-aware shrinking)

Run on the TPU from the repo root:  python scripts/r5_group_probe.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavelets_tpu.ops import pallas_conv
from wavelets_tpu.ops.filters import B3SPLINE

_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=114 << 20)
ssum = jax.jit(jnp.sum)
rng = np.random.default_rng(0)
x4k = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
print("devices:", jax.devices(), flush=True)
float(ssum(x4k))

TAPS = B3SPLINE.taps
HW = 2
G = 4
TH = TW = 1024
R = pallas_conv._wow_group_halo(HW, 0, G)           # 46
Rr, Rc = pallas_conv._aligned_halos(R)              # 48, 64
N = TH + 2 * Rr
M = TW + 2 * Rc
NI = NJ = 4096 // TH
NT = NI * NJ


def timeit(fn, v, iters=20):
    """Chained iterations + jitted scalar sync, RTT subtracted (the
    proven tunnel methodology, cf. bench.py) — fn must map v's
    shape/dtype to itself."""
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


# ---- A: production kernel -------------------------------------------
fac = jnp.ones((G,), jnp.float32)
thr = jnp.zeros((G, 1), jnp.float32)
for need in (True, False):
    @jax.jit
    def prod(v, need=need):
        cube, acc = pallas_conv._fused_wow_group(
            v, fac, thr, G, B3SPLINE, offset=0, soft=True,
            masked=(False,) * G, need_cube=need)
        r = cube[G if need else 0] + acc
        if need:
            for k in range(G):
                r = r + cube[k]
        return r
    print(f"A prod planes={need}: {timeit(prod, x4k):.3f} ms",
          flush=True)


# ---- pre-tiling -----------------------------------------------------
@jax.jit
def pretile(v):
    xp = jnp.pad(v, ((Rr, Rr), (Rc, Rc)), mode="symmetric")
    tiles = [xp[i * TH:i * TH + N, j * TW:j * TW + M]
             for i in range(NI) for j in range(NJ)]
    return jnp.stack(tiles)

# (pretile alone is not chainable; see pretile_rt below)


# ---- B: BlockSpec whiten kernel on pre-tiled input ------------------
def conv_pass(src, dst, d, axis, lo=0, hi=0):
    """lo/hi: extra interior shrink (creep-aware variant C)."""
    hw = HW
    n = (N if axis == 0 else M)
    m = hw * d

    def sl(a, b):
        if axis == 0:
            return src[a:b, :]
        return src[:, a:b]

    a0, b0 = m + lo, n - m - hi
    out = sl(a0, b0) * TAPS[hw]
    for j in range(1, hw + 1):
        out = out + TAPS[hw + j] * (sl(a0 - j * d, b0 - j * d)
                                    + sl(a0 + j * d, b0 + j * d))
    if axis == 0:
        dst[a0:b0, :] = out
    else:
        dst[:, a0:b0] = out


def make_group_kernel(planes: bool, shrink: bool):
    def kernel(x_ref, *refs):
        n_out = (G + 1 if planes else 1) + 1
        outs = refs[:n_out]
        a, b, c, pw = refs[n_out:]
        a[...] = x_ref[0]
        bufs = [a, b, c]
        acc = jnp.zeros((TH, TW), jnp.float32)
        cur = bufs[0]
        # creep per scale: chain creep after scale s is hw*(2^(s+1)-1)
        for s in range(G):
            d = 1 << s
            tmp, sm = bufs[1], bufs[2]
            creep = HW * ((1 << (s + 1)) - 1) if shrink else 0
            lo = creep if shrink else 0
            conv_pass(cur, tmp, d, 0)
            conv_pass(tmp, sm, d, 1)
            pw[...] = cur[...] - sm[...]
            wc = pw[Rr:Rr + TH, Rc:Rc + TW]
            tmp[...] = pw[...] * pw[...]
            conv_pass(tmp, cur, d, 0)
            conv_pass(cur, tmp, d, 1)
            lp = tmp[Rr:Rr + TH, Rc:Rc + TW]
            lp = jnp.sqrt(jnp.where(lp <= 0, jnp.float32(1e-15), lp))
            white = wc / lp
            if planes:
                outs[s][0] = white
            acc = acc + white
            bufs = [sm, tmp, cur]
            cur = bufs[0]
        outs[G if planes else 0][0] = cur[Rr:Rr + TH, Rc:Rc + TW]
        outs[n_out - 1][0] = acc

    n_out = (G + 1 if planes else 1) + 1

    def untile(t):
        # (NT, TH, TW) tile stack -> (4096, 4096) image
        return t.reshape(NI, NJ, TH, TW).transpose(0, 2, 1, 3).reshape(
            NI * TH, NJ * TW)

    def run(tiles):
        outs = pl.pallas_call(
            kernel,
            grid=(NT,),
            out_shape=tuple([jax.ShapeDtypeStruct((NT, TH, TW),
                                                  jnp.float32)] * n_out),
            in_specs=[pl.BlockSpec((1, N, M), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=tuple([pl.BlockSpec((1, TH, TW),
                                          lambda i: (i, 0, 0))] * n_out),
            scratch_shapes=[pltpu.VMEM((N, M), jnp.float32)] * 4,
            compiler_params=_PARAMS,
        )(tiles)
        r = outs[0]
        for o in outs[1:]:
            r = r + o
        return untile(r)
    return run


# chainable pretile roundtrip (pretile + tile-center reassembly): the
# reassembly half costs about the same relayout as the pretile half
pretile_rt = jax.jit(lambda v: pretile(v)[
    :, Rr:Rr + TH, Rc:Rc + TW].reshape(
    NI, NJ, TH, TW).transpose(0, 2, 1, 3).reshape(4096, 4096))
print(f"pretile+reassemble roundtrip: {timeit(pretile_rt, x4k):.3f} ms",
      flush=True)

for planes in (True, False):
    krun = make_group_kernel(planes, shrink=False)
    full = jax.jit(lambda v: krun(pretile(v)))
    print(f"B pretile+kernel+untile planes={planes}: "
          f"{timeit(full, x4k):.3f} ms", flush=True)

print("DONE", flush=True)
