"""Round-3 IO-style probe at the deep kernel's geometry: 4k f32 image
streamed as (T, W) full-width row blocks (T=16 -> 256 steps).  Compares
BlockSpec-managed vs manual-DMA input/output pipelines, one vs two
outputs, and sequential vs class-ordered (strided) output index maps —
to locate the fixed per-step cost that keeps the deep whiten steps at
~2.5x their DMA floor."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 4096
T = 16
NB = N // T  # 256 steps


def sync(v):
    return float(jax.jit(jnp.sum)(jnp.ravel(v)[:1]))


def timeit(f, x, iters=50):
    """On-device chained timing: K kernel invocations inside one jitted
    fori_loop (zero per-iteration dispatch), differenced between K and
    2K to cancel the tunnel's constant sync offset (~1 ms, noisy)."""
    def body(_, v):
        o = f(v)
        return o[0] if isinstance(o, tuple) else o

    loop1 = jax.jit(lambda v: jax.lax.fori_loop(0, iters, body, v))
    loop2 = jax.jit(lambda v: jax.lax.fori_loop(0, 2 * iters, body, v))
    sync(loop1(x))
    sync(loop2(x))
    diffs = []
    for _ in range(5):
        t0 = time.perf_counter()
        sync(loop1(x))
        t1 = time.perf_counter()
        sync(loop2(x))
        t2 = time.perf_counter()
        diffs.append(((t2 - t1) - (t1 - t0)) / iters)
    diffs.sort()
    return diffs[len(diffs) // 2]


def report(name, dt, moves):
    gbs = moves * N * N * 4 / dt / 1e9
    print(f"{name:42s}: {dt*1e3:6.3f} ms  ({dt/NB*1e6:5.1f} us/step, "
          f"{gbs:5.0f} GB/s)", flush=True)


def bs_in_bs_out(x):
    def kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0
    return pl.pallas_call(
        kernel, grid=(NB,),
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
        in_specs=[pl.BlockSpec((T, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((T, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x)


def man_in_bs_out(x, n_out=1, strided=False):
    DT = 16  # class stride (like s=8: D=256, T=16)

    def omap(i):
        if not strided:
            return (i, 0)
        # class-ordered: i = p*(NB//DT) + k -> block k*DT + p
        p = i // (NB // DT)
        k = i % (NB // DT)
        return (k * DT + p, 0)

    def kernel(x_hbm, *refs):
        outs = refs[:n_out]
        buf, sems = refs[n_out:]
        i = pl.program_id(0)

        def dma(st, which):
            bi, _ = omap(which) if strided else (which, 0)
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(bi * T, T), :], buf.at[st], sems.at[st])

        @pl.when(i == 0)
        def _():
            dma(0, i).start()

        @pl.when(i + 1 < NB)
        def _():
            dma((i + 1) % 2, i + 1).start()

        dma(i % 2, i).wait()
        for k, o in enumerate(outs):
            o[:] = buf[i % 2] + (1.0 + k)

    return pl.pallas_call(
        kernel, grid=(NB,),
        out_shape=tuple(jax.ShapeDtypeStruct((N, N), jnp.float32)
                        for _ in range(n_out)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(pl.BlockSpec((T, N), omap,
                                     memory_space=pltpu.VMEM)
                        for _ in range(n_out)),
        scratch_shapes=[pltpu.VMEM((2, T, N), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )(x)


def man_in_man_out(x, n_out=1):
    def kernel(x_hbm, *refs):
        outs = refs[:n_out]
        buf, obuf, sems, osems = refs[n_out:]
        i = pl.program_id(0)

        def dma(st, which):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(which * T, T), :], buf.at[st],
                sems.at[st])

        def odma(k, st, which):
            return pltpu.make_async_copy(
                obuf.at[k, st], outs[k].at[pl.ds(which * T, T), :],
                osems.at[k, st])

        @pl.when(i == 0)
        def _():
            dma(0, i).start()

        @pl.when(i + 1 < NB)
        def _():
            dma((i + 1) % 2, i + 1).start()

        dma(i % 2, i).wait()
        # wait for the out slot's previous transfer before overwriting
        @pl.when(i >= 2)
        def _():
            for k in range(n_out):
                odma(k, i % 2, i - 2).wait()

        for k in range(n_out):
            obuf[k, i % 2] = buf[i % 2] + (1.0 + k)
            odma(k, i % 2, i).start()

        @pl.when(i == NB - 1)
        def _():
            for k in range(n_out):
                odma(k, i % 2, i).wait()

                @pl.when(i >= 1)
                def _():
                    odma(k, (i - 1) % 2, i - 1).wait()

    return pl.pallas_call(
        kernel, grid=(NB,),
        out_shape=tuple(jax.ShapeDtypeStruct((N, N), jnp.float32)
                        for _ in range(n_out)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY)
                        for _ in range(n_out)),
        scratch_shapes=[pltpu.VMEM((2, T, N), jnp.float32),
                        pltpu.VMEM((max(n_out, 1), 2, T, N), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((max(n_out, 1), 2))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x)


def main():
    x = jax.jit(lambda: jax.random.normal(
        jax.random.PRNGKey(0), (N, N), jnp.float32))()
    sync(x)

    report("bs-in bs-out 1o i50", timeit(jax.jit(bs_in_bs_out), x, 50), 2)
    report("bs-in bs-out 1o i100", timeit(jax.jit(bs_in_bs_out), x, 100), 2)
    report("bs-in bs-out 1o", timeit(jax.jit(bs_in_bs_out), x, 100), 2)
    report("man-in bs-out 1o", timeit(
        jax.jit(lambda a: man_in_bs_out(a, 1)), x, 100), 2)
    report("man-in bs-out 2o", timeit(
        jax.jit(lambda a: man_in_bs_out(a, 2)), x, 100), 3)
    report("man-in bs-out 2o strided-omap", timeit(
        jax.jit(lambda a: man_in_bs_out(a, 2, strided=True)), x, 100), 3)
    report("man-in man-out 1o", timeit(
        jax.jit(lambda a: man_in_man_out(a, 1)), x, 100), 2)
    report("man-in man-out 2o", timeit(
        jax.jit(lambda a: man_in_man_out(a, 2)), x, 100), 3)

    # sanity: results correct?
    a = man_in_man_out(x, 2)
    import numpy as np
    ok1 = bool(jnp.all(a[0] == x + 1.0))
    ok2 = bool(jnp.all(a[1] == x + 2.0))
    print("man-out correctness:", ok1, ok2, flush=True)


if __name__ == "__main__":
    main()
