"""Round-3: quantify the MXU mirror-flip cost in the deep kernel by
monkeypatching the exact-dot flips to identity (wrong numerics, same
structure) and re-timing.  Also times a butterfly-roll lane reversal
candidate."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from wavelets_tpu.ops import pallas_deep
from wavelets_tpu.ops.filters import B3SPLINE


def sync(v):
    return float(jax.jit(jnp.sum)(jnp.ravel(v)[:1]))


def timeit(f, x, iters=30):
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
    return diffs[len(diffs) // 2] * 1e3


rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(1, 4096, 4096)).astype(np.float32))
sync(x)


def step(v, s):
    w, r, c = pallas_deep.deep_whiten_step(
        v, None, jnp.zeros((1,)), sf=B3SPLINE, scale=s,
        weight=1.0, masked=False, write_plane=True)
    return c


for s in (6, 9):
    print(f"s={s} baseline: {timeit(lambda v, s=s: step(v, s), x):.2f} ms",
          flush=True)

# identity-patch the flips (both the row mirror and the column mirror)
orig_dot, orig_dotl = pallas_deep._exact_dot, pallas_deep._exact_dot_left
pallas_deep._exact_dot = lambda a, b: a
pallas_deep._exact_dot_left = lambda a, b: b
pallas_deep.deep_whiten_step.clear_cache()
for s in (6, 9):
    print(f"s={s} no-flips: {timeit(lambda v, s=s: step(v, s), x):.2f} ms",
          flush=True)
pallas_deep._exact_dot, pallas_deep._exact_dot_left = orig_dot, orig_dotl
pallas_deep.deep_whiten_step.clear_cache()

# butterfly-roll reversal candidate: lanes (last axis), (16, 4096) f32
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def rev_lanes(v, n):
    """Reverse the last axis (n lanes) via XOR-butterfly of rolls."""
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    s = n // 2
    while s >= 1:
        fwd = pltpu.roll(v, n - s, v.ndim - 1)   # out[i] = v[i+s]
        bwd = pltpu.roll(v, s, v.ndim - 1)       # out[i] = v[i-s]
        v = jnp.where((col & s) == 0, fwd, bwd)
        s //= 2
    return v


def mk(nrev):
    def kernel(x_ref, o_ref):
        v = x_ref[:]
        for _ in range(nrev):
            v = rev_lanes(v, v.shape[-1])
        o_ref[:] = v
    return kernel


for nrev in (0, 1, 4):
    f = jax.jit(lambda a, nrev=nrev: pl.pallas_call(
        mk(nrev), grid=(256,),
        out_shape=jax.ShapeDtypeStruct((4096, 4096), jnp.float32),
        in_specs=[pl.BlockSpec((16, 4096), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, 4096), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(a))
    x2 = x[0]
    if nrev == 1:
        got = np.asarray(f(x2))
        ok = np.array_equal(got, np.asarray(x2)[:, ::-1])
        print("rev_lanes bitwise correct:", ok, flush=True)
    print(f"stream + {nrev} lane-reversals/block: "
          f"{timeit(f, x2):.2f} ms", flush=True)
