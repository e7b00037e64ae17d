#!/usr/bin/env python
"""Round-5 fold-pass probe: where do the whiten group's 2.77 ms go?

The round-4 verdict names MXU banded-matmul fold passes as the
candidate for closing the whiten groups' roofline gap (2.77 ms vs a
0.68 ms HBM floor at 4k², group (0,4)).  FLOP analysis says a 5-tap
dilated stencil is *cheaper* on the VPU at its nominal stencil rate
(~17 vector ops/elem at 3.5 Tops = 4.9 ps/elem) than as block-banded
MXU matmuls with the f32-exactness bf16x3 split (>=1152 flops/elem at
197 Tflops = 5.8+ ps/elem) -- the open question is why the measured
effective VPU rate is ~1.1 Tops.  This probe isolates the fold passes
from the DMA pipeline and measures, per variant, on hardware:

  v0  current shift-add pass (unaligned static-slice reads), per d
  v1  MXU block-banded pass (aligned 128-blocks, bf16x3 split)
  v1b MXU block-banded pass, bf16 data (no split -- exact for bf16)
  v2  pltpu.roll-based pass (aligned reads, rolls instead of slices)
  v3  aligned-only shift-add (d=8: all row shifts sublane-aligned)
  v4  sublane(axis0)-only vs lane(axis1)-only chains (shift cost split)
  v5  16-pass group-compute chain (the real per-scale mix, no DMA)

Each variant runs P passes back-to-back on a VMEM-resident window the
size of the real whiten tile (1152x1152 with halos), on a grid of 16
tiles so HBM in/out (~0.2 ms) is amortized and compute dominates.

Run on the TPU from the repo root:  python scripts/r5_fold_probe.py
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1152   # window rows (9 x 128)
M = 1152   # window cols
NT = 16    # tiles (simulates 4k^2 at 1024^2 tiles)
P = 16     # passes per tile (4 scales x 2 convs x 2 axes)

_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 << 20)

ssum = jax.jit(jnp.sum)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(NT, N, M)).astype(np.float32))
print("devices:", jax.devices(), flush=True)
float(ssum(x))

TAPS = (1 / 16, 1 / 4, 3 / 8, 1 / 4, 1 / 16)


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


def conv_pass(src, dst, d, axis):
    """Current production fold: 4 shifted reads + 5 muls + 4 adds over
    the interior; edges stale (creep)."""
    hw = 2
    n = src.shape[axis]
    m = hw * d

    def sl(lo, hi):
        if axis == 0:
            return src[lo:hi, :]
        return src[:, lo:hi]

    out = sl(m, n - m) * TAPS[hw]
    for j in range(1, hw + 1):
        out = out + TAPS[hw + j] * (sl(m - j * d, n - m - j * d)
                                    + sl(m + j * d, n - m + j * d))
    if axis == 0:
        dst[m:n - m, :] = out
    else:
        dst[:, m:n - m] = out


def make_chain(pass_fn, dlist):
    """Kernel: P passes alternating axis, cycling dilations."""
    def kernel(x_ref, o_ref, a, b):
        a[...] = x_ref[0]
        bufs = [a, b]
        for p, (d, axis) in enumerate(dlist):
            pass_fn(bufs[0], bufs[1], d, axis)
            bufs.reverse()
        o_ref[0] = bufs[0][...]

    def run(v):
        return pl.pallas_call(
            kernel,
            grid=(NT,),
            out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
            in_specs=[pl.BlockSpec((1, N, M), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, N, M), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((N, M), v.dtype),
                            pltpu.VMEM((N, M), v.dtype)],
            compiler_params=_PARAMS,
        )(v)
    return jax.jit(run)


def sched(ds=(1, 2, 4, 8)):
    """Real group-(0,4) pass mix: per scale two convs x two axes."""
    out = []
    for d in ds:
        out += [(d, 0), (d, 1), (d, 0), (d, 1)]
    return out


# ---- v0: current shift-add, real mix + per-d cost -------------------
dt = timeit(make_chain(conv_pass, sched()), x)
print(f"v0 shift-add 16-pass mix (d=1,2,4,8): {dt:.3f} ms "
      f"({dt/NT/P*1e3:.1f} us/pass/tile)", flush=True)
for d in (1, 2, 4, 8):
    dl = [(d, 0), (d, 1)] * 8
    dt = timeit(make_chain(conv_pass, dl), x)
    print(f"v0 shift-add d={d} (row+col): {dt:.3f} ms "
          f"({dt/NT/P*1e3:.1f} us/pass/tile)", flush=True)

# ---- v4: axis split --------------------------------------------------
for axis, name in ((0, "sublane/axis0"), (1, "lane/axis1")):
    dl = [(d, axis) for d in (1, 2, 4, 8) for _ in range(4)]
    dt = timeit(make_chain(conv_pass, dl), x)
    print(f"v4 {name}-only 16 passes: {dt:.3f} ms "
          f"({dt/NT/P*1e3:.1f} us/pass/tile)", flush=True)

# ---- v2: roll-based --------------------------------------------------
def roll_pass(src, dst, d, axis):
    hw = 2
    n = N if axis == 0 else M
    v = src[...]
    out = v * TAPS[hw]
    for j in range(1, hw + 1):
        out = out + TAPS[hw + j] * (
            pltpu.roll(v, shift=n - j * d, axis=axis)
            + pltpu.roll(v, shift=j * d, axis=axis))
    dst[...] = out

try:
    dt = timeit(make_chain(roll_pass, sched()), x)
    print(f"v2 roll 16-pass mix: {dt:.3f} ms "
          f"({dt/NT/P*1e3:.1f} us/pass/tile)", flush=True)
except Exception as e:
    print(f"v2 roll: FAIL {str(e).splitlines()[0][:100]}", flush=True)


# ---- v1: MXU block-banded (axis 0), bf16x3 split --------------------
def band_blocks(d, dtype):
    """A0/Am/Ap: 128x128 Toeplitz blocks of the banded row matrix."""
    i = np.arange(128)
    A0 = np.zeros((128, 128), np.float32)
    Am = np.zeros((128, 128), np.float32)
    Ap = np.zeros((128, 128), np.float32)
    for j, t in zip((-2, -1, 0, 1, 2), TAPS):
        off = j * d
        for r in range(128):
            c = r + off
            if 0 <= c < 128:
                A0[r, c] += t
            elif c < 0:
                Am[r, c + 128] += t
            else:
                Ap[r, c - 128] += t
    return (jnp.asarray(A0, dtype), jnp.asarray(Am, dtype),
            jnp.asarray(Ap, dtype))


def make_mxu_chain(dlist, split=3):
    nb = N // 128
    ds = sorted({d for d, _ in dlist})
    # band matrices ride as a (len(ds), 3, 128, 128) VMEM input — Pallas
    # rejects captured traced constants in the kernel closure
    mat_in = jnp.stack([jnp.stack(band_blocks(d, jnp.bfloat16))
                        for d in ds])

    def dot1(A, xb):
        return jax.lax.dot_general(
            A, xb, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def dotx(A, xs):
        # xs: list of split components (each bf16 as f32-storable)
        out = dot1(A, xs[0])
        for c in xs[1:]:
            out = out + dot1(A, c)
        return out

    def mxu_pass(src, dst, d, axis, m_ref):
        assert axis == 0
        k = ds.index(d)
        A0 = m_ref[k, 0]
        Am = m_ref[k, 1]
        Ap = m_ref[k, 2]
        v = src[...]
        if split == 3:
            hi = v.astype(jnp.bfloat16).astype(jnp.float32)
            mid = (v - hi).astype(jnp.bfloat16).astype(jnp.float32)
            lo = (v - hi - mid).astype(jnp.bfloat16)
            comps = lambda sl: [hi[sl].astype(jnp.bfloat16),
                                mid[sl].astype(jnp.bfloat16), lo[sl]]
        else:
            comps = lambda sl: [v[sl].astype(jnp.bfloat16)]
        for I in range(1, nb - 1):
            r0 = I * 128
            out = dotx(A0, comps(np.s_[r0:r0 + 128]))
            out = out + dotx(Am, comps(np.s_[r0 - 128:r0]))
            out = out + dotx(Ap, comps(np.s_[r0 + 128:r0 + 256]))
            dst[r0:r0 + 128, :] = out.astype(dst.dtype)

    def kernel(m_ref, x_ref, o_ref, a, b):
        a[...] = x_ref[0]
        bufs = [a, b]
        for d, axis in dlist:
            mxu_pass(bufs[0], bufs[1], d, axis, m_ref)
            bufs.reverse()
        o_ref[0] = bufs[0][...]

    def run(v):
        return pl.pallas_call(
            kernel,
            grid=(NT,),
            out_shape=jax.ShapeDtypeStruct(v.shape, v.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, N, M), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, N, M), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((N, M), v.dtype),
                            pltpu.VMEM((N, M), v.dtype)],
            compiler_params=_PARAMS,
        )(mat_in, v)
    return jax.jit(run)


dl0 = [(d, 0) for d in (1, 2, 4, 8) for _ in range(4)]
for split in (3, 1):
    try:
        dt = timeit(make_mxu_chain(dl0, split=split), x)
        print(f"v1 MXU block-banded axis0 split={split}: {dt:.3f} ms "
              f"({dt/NT/P*1e3:.1f} us/pass/tile)", flush=True)
    except Exception as e:
        print(f"v1 MXU split={split}: FAIL "
              f"{str(e).splitlines()[0][:100]}", flush=True)

# ---- v1b / v0b: bf16 data --------------------------------------------
xb16 = x.astype(jnp.bfloat16)
try:
    dt = timeit(make_chain(conv_pass, sched()), xb16)
    print(f"v0b shift-add bf16 16-pass mix: {dt:.3f} ms "
          f"({dt/NT/P*1e3:.1f} us/pass/tile)", flush=True)
except Exception as e:
    print(f"v0b bf16: FAIL {str(e).splitlines()[0][:100]}", flush=True)
try:
    dt = timeit(make_mxu_chain(dl0, split=1), xb16)
    print(f"v1b MXU bf16 axis0 no-split: {dt:.3f} ms "
          f"({dt/NT/P*1e3:.1f} us/pass/tile)", flush=True)
except Exception as e:
    print(f"v1b MXU bf16: FAIL {str(e).splitlines()[0][:100]}",
          flush=True)

print("DONE", flush=True)
