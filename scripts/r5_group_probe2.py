#!/usr/bin/env python
"""Round-5 whiten-group probe, part 2: isolate the serializer.

r5_group_probe measured (4k^2, group (0,4), 1024^2 tiles):
  A  production kernel:            2.84 planes / 2.49 serving
  B  pretile + BlockSpec kernel:   3.04 / 2.55 end-to-end, but
     kernel-only ~2.3 / ~1.8 after the ~0.42 pretile + ~0.35 untile
So the BlockSpec-scheduled kernel pipelines ~0.5-0.7 ms better than
production.  This probe asks WHERE production loses it:

  B2  manual-DMA input (production's scheme, no column reuse) +
      B's compute + direct image-layout BlockSpec outputs (no pretile,
      no untile).  If B2 ~= B-kernel-only, the input path is innocent
      and production's loss is elsewhere (e.g. column-halo reuse edge
      saves, or the revolving multi-output windows under VMEM
      pressure); if B2 ~= A, the manual input DMA serializes the step.
  B2r B2 + column-halo reuse edge saves (production's full input path).
  B2s B2 with 512x512 tiles (VMEM pressure off: every output window
      comfortably double-buffered).

Run on the TPU from the repo root:  python scripts/r5_group_probe2.py
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
R = pallas_conv._wow_group_halo(HW, 0, G)           # 46
Rr, Rc = pallas_conv._aligned_halos(R)              # 48, 64


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


def make_b2(TH, TW, planes: bool):
    N = TH + 2 * Rr
    M = TW + 2 * Rc
    NI = 4096 // TH
    NJ = 4096 // TW
    n_out = (G + 1 if planes else 1) + 1

    def conv_pass(src, dst, d, axis):
        n = (N if axis == 0 else M)
        m = HW * d

        def sl(a, b):
            if axis == 0:
                return src[a:b, :]
            return src[:, a:b]

        out = sl(m, n - m) * TAPS[HW]
        for j in range(1, HW + 1):
            out = out + TAPS[HW + j] * (sl(m - j * d, n - m - j * d)
                                        + sl(m + j * d, n - m + j * d))
        if axis == 0:
            dst[m:n - m, :] = out
        else:
            dst[:, m:n - m] = out

    def kernel(x_hbm, *refs):
        outs = refs[:n_out]
        bufs, b, c, pw, sems = refs[n_out:]
        i = pl.program_id(0)
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        step = i * nj + j
        nsteps = pl.num_programs(0) * nj
        slot = step % 2

        def in_dma(st, which):
            ii, jj = which // nj, which % nj
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(ii * TH, N), pl.ds(jj * TW, M)],
                bufs.at[st], sems.at[st])

        @pl.when(step == 0)
        def _():
            in_dma(slot, step).start()

        @pl.when(step + 1 < nsteps)
        def _():
            in_dma((step + 1) % 2, step + 1).start()

        in_dma(slot, step).wait()
        a = bufs.at[slot]
        bufs3 = [a, b, c]
        acc = jnp.zeros((TH, TW), jnp.float32)
        cur = bufs3[0]
        for s in range(G):
            d = 1 << s
            tmp, sm = bufs3[1], bufs3[2]
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
                outs[s][...] = white
            acc = acc + white
            bufs3 = [sm, tmp, cur]
            cur = bufs3[0]
        outs[G if planes else 0][...] = cur[Rr:Rr + TH, Rc:Rc + TW]
        outs[n_out - 1][...] = acc

    def run(v):
        xp = jnp.pad(v, ((Rr, Rr), (Rc, Rc)), mode="symmetric")
        outs = pl.pallas_call(
            kernel,
            grid=(NI, NJ),
            out_shape=tuple([jax.ShapeDtypeStruct((4096, 4096),
                                                  jnp.float32)] * n_out),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=tuple([pl.BlockSpec((TH, TW),
                                          lambda i, j: (i, j))] * n_out),
            scratch_shapes=[
                pltpu.VMEM((2, N, M), jnp.float32),
                pltpu.VMEM((N, M), jnp.float32),
                pltpu.VMEM((N, M), jnp.float32),
                pltpu.VMEM((N, M), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=_PARAMS,
        )(xp)
        r = outs[0]
        for o in outs[1:]:
            r = r + o
        return r
    return jax.jit(run)


for TH, TW in ((1024, 1024), (512, 512)):
    for planes in (True, False):
        try:
            dt = timeit(make_b2(TH, TW, planes), x4k)
            print(f"B2 manualDMA tiles=({TH},{TW}) planes={planes}: "
                  f"{dt:.3f} ms", flush=True)
        except Exception as e:
            print(f"B2 tiles=({TH},{TW}) planes={planes}: FAIL "
                  f"{str(e).splitlines()[0][:110]}", flush=True)
print("DONE", flush=True)
