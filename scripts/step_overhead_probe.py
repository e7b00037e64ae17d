#!/usr/bin/env python
"""Isolate the per-grid-step cost of Pallas pipelines on this platform.

Three kernels stream the same 4k f32 image (read+write) with (512,256)
tiles = 128 steps:
  A. pure BlockSpec in+out (Mosaic-managed pipeline)
  B. manual-DMA input (1 construct+wait per step) + BlockSpec out
  C. manual-DMA input + K extra dummy DMA constructs per step
Comparing times gives the fixed cost per step and per DMA construct.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4096
TH, TW = 512, 256
GRID = (N // TH, N // TW)


def sync(v):
    return float(jax.jit(jnp.sum)(jnp.ravel(v)[:1]))


def timeit(f, x, iters=20):
    out = f(x)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(5):
        sync(x)
    rtt = (time.perf_counter() - t0) / 5
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        cur = x
        for _ in range(iters):
            cur = f(cur)
        sync(cur)
        dt = (time.perf_counter() - t0 - rtt) / iters
        best = dt if best is None else min(best, dt)
    return best


def kernel_a(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


def make_b():
    def kernel(x_hbm, o_ref, buf, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        ni = pl.num_programs(0)
        nj = pl.num_programs(1)
        step = i * nj + j

        def dma(st, which):
            ii = which // nj
            jj = which % nj
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(ii * TH, TH), pl.ds(jj * TW, TW)],
                buf.at[st], sems.at[st])

        @pl.when(step == 0)
        def _():
            dma(0, step).start()

        @pl.when(step + 1 < ni * nj)
        def _():
            dma((step + 1) % 2, step + 1).start()

        dma(step % 2, step).wait()
        o_ref[:] = buf[step % 2] + 1.0

    return kernel


def make_c(extra):
    """extra additional real (tiny) DMA construct+start+wait per step."""
    def kernel(x_hbm, o_ref, buf, tiny, sems, tsems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        ni = pl.num_programs(0)
        nj = pl.num_programs(1)
        step = i * nj + j

        def dma(st, which):
            ii = which // nj
            jj = which % nj
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(ii * TH, TH), pl.ds(jj * TW, TW)],
                buf.at[st], sems.at[st])

        @pl.when(step == 0)
        def _():
            dma(0, step).start()

        @pl.when(step + 1 < ni * nj)
        def _():
            dma((step + 1) % 2, step + 1).start()

        for k in range(extra):
            t = pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * TH, 8), pl.ds(j * TW, 128)],
                tiny.at[k], tsems.at[k])
            t.start()
            t.wait()
        dma(step % 2, step).wait()
        o_ref[:] = buf[step % 2] + 1.0

    return kernel


def main():
    x = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (N, N), jnp.float32))()
    sync(x)

    fa = jax.jit(lambda a: pl.pallas_call(
        kernel_a,
        grid=GRID,
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
        in_specs=[pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(a))
    dt = timeit(fa, x)
    print(f"A blockspec in+out       : {dt*1e3:.3f} ms "
          f"({dt/128*1e6:.1f} us/step)", flush=True)

    def run_b():
        k = make_b()
        return jax.jit(lambda a: pl.pallas_call(
            k,
            grid=GRID,
            out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, TH, TW), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(a))

    dt = timeit(run_b(), x)
    print(f"B manual-in blockspec-out: {dt*1e3:.3f} ms "
          f"({dt/128*1e6:.1f} us/step)", flush=True)

    for extra in (4, 12):
        k = make_c(extra)
        fc = jax.jit(lambda a, kk=k, e=extra: pl.pallas_call(
            kk,
            grid=GRID,
            out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, TH, TW), jnp.float32),
                pltpu.VMEM((e, 8, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((e,)),
            ],
        )(a))
        dt = timeit(fc, x)
        print(f"C +{extra:2d} tiny dma/step    : {dt*1e3:.3f} ms "
              f"({dt/128*1e6:.1f} us/step)", flush=True)


if __name__ == "__main__":
    main()
