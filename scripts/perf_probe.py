#!/usr/bin/env python
"""Round-2 perf probe: platform streaming ceiling + per-piece breakdown
of the 4k L10 WOW pipeline, plus a tile-size sweep of the fused
decompose kernel (per-grid-step overhead study).

All data is generated ON DEVICE (host->device transfers through the
axon tunnel are slow and were hanging the first version of this
script).  Segments print eagerly; select with argv[1] as a
comma-separated list (default: all).

Usage: python scripts/perf_probe.py [ceiling,groups,sweep,tail,whiten,median,e2e]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from wavelets_tpu.ops.filters import B3SPLINE
from wavelets_tpu.core.transform import decompose

N = 4096


def sync(v):
    return float(jax.jit(jnp.sum)(jnp.ravel(v)[:1]))


def timeit(f, x, iters=10, feed=None):
    out = f(x)
    sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(5):
        sync(x)
    rtt = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    cur = x
    for _ in range(iters):
        out = f(cur)
        cur = feed(out, cur) if feed else out
    sync(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0 - rtt) / iters


def report(name, dt, bytes_moved):
    gbps = bytes_moved / dt / 1e9
    print(f"{name:44s} {dt * 1e3:8.3f} ms  {gbps:7.1f} GB/s", flush=True)
    return dt


def devrand(shape, seed=0):
    return jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(seed), shape,
                                  jnp.float32))()


def main():
    segs = (sys.argv[1].split(",") if len(sys.argv) > 1 else
            ["ceiling", "groups", "sweep", "tail", "whiten", "median",
             "e2e"])
    img_b = N * N * 4
    t0 = time.perf_counter()
    x = devrand((N, N))
    sync(x)
    print(f"setup {time.perf_counter() - t0:.1f}s", flush=True)

    if "ceiling" in segs:
        f_copy = jax.jit(lambda a: a + 1.0)
        report("xla copy 4k x+1 (r1 w1)", timeit(f_copy, x, 20), 2 * img_b)
        big = devrand((8192, 8192), 1)
        report("xla copy 8k (r1 w1)", timeit(f_copy, big, 20),
               2 * 8192 * 8192 * 4)
        del big

    planes11 = devrand((11, N, N), 2)
    if "ceiling" in segs:
        f_sum = jax.jit(lambda p: jnp.sum(p, axis=0))
        report("plane sum 11->1 (r11 w1)",
               timeit(f_sum, planes11, 10, feed=lambda o, p: p),
               12 * img_b)

    if "groups" in segs or "sweep" in segs:
        import wavelets_tpu.ops.pallas_conv as pc

        raw_group = pc._fused_group.__wrapped__

        def time_group(level, offset, tiles=None, label=""):
            orig = pc._plan_tiles
            if tiles is not None:
                pc._plan_tiles = lambda *a, **k: tiles
            try:
                f = jax.jit(lambda a: raw_group(a, level, B3SPLINE,
                                                offset=offset))
                dt = timeit(f, x, feed=lambda o, a: o[level])
            finally:
                pc._plan_tiles = orig
            ideal = (1 + level + 1) * img_b
            report(f"fused group L{level} off{offset} {label}", dt, ideal)

        if "groups" in segs:
            time_group(5, 0, label="(auto)")
            time_group(1, 5, label="(auto)")
        if "sweep" in segs:
            for tiles in ((256, 256), (256, 512), (512, 256), (512, 512)):
                time_group(5, 0, tiles=tiles, label=f"tiles={tiles}")

    if "tail" in segs:
        f_tail = jax.jit(lambda a: decompose(
            a, 4, B3SPLINE, scale_offset=6, use_pallas=False))
        report("xla tail 4 scales off6",
               timeit(f_tail, x, feed=lambda o, a: o[4]), 6 * img_b)
        for off in (0, 6):
            f1 = jax.jit(lambda a, o=off: decompose(
                a, 1, B3SPLINE, scale_offset=o, use_pallas=False))
            report(f"xla 1 scale off{off}",
                   timeit(f1, x, feed=lambda o, a: o[1]), 3 * img_b)

    if "whiten" in segs:
        from wavelets_tpu.ops.pallas_wow import fused_whiten_pieces

        factors = jnp.ones((6,), jnp.float32)
        thresholds = jnp.zeros((6,), jnp.float32)
        layout = tuple((0, s) for s in range(6))

        def f_wh(p):
            return fused_whiten_pieces(
                (p[:, None],), factors, thresholds, B3SPLINE, 6,
                layout, soft=True)

        report("fused whiten 6 scales (planes out)",
               timeit(jax.jit(f_wh), planes11, feed=lambda o, p: p),
               13 * img_b)

        def f_wh_ro(p):
            return fused_whiten_pieces(
                (p[:, None],), factors, thresholds, B3SPLINE, 6,
                layout, soft=True, write_planes=False)

        report("fused whiten 6 scales (recon only)",
               timeit(jax.jit(f_wh_ro), planes11, feed=lambda o, p: p),
               7 * img_b)

        from wavelets_tpu.ops.conv import smooth

        def deep(p):
            acc = jnp.zeros((N, N), jnp.float32)
            for s in range(6, 10):
                c = p[s]
                lp = smooth(c * c, B3SPLINE, scale=s)
                lp = jnp.sqrt(jnp.where(lp <= 0, 1e-15, lp))
                acc = acc + c / lp
            return acc

        report("xla deep whiten s6..9",
               timeit(jax.jit(deep), planes11, feed=lambda o, p: p),
               9 * img_b)

    if "median" in segs:
        from wavelets_tpu.ops.stats import median_abs

        report("pallas exact median 4k",
               timeit(jax.jit(median_abs), x, feed=lambda o, a: a),
               8 * img_b)

    if "e2e" in segs:
        from wavelets_tpu.models.wow import wow_core

        zero = jnp.zeros((), jnp.float32)
        st = dict(sf=B3SPLINE, n_scales=10, weights=(1.0,) * 11,
                  whitening=True,
                  denoise_coefficients=(0.0,) * 10 + (1.0,),
                  bilateral=None, bilateral_scaling=False,
                  soft_threshold=True, preserve_variance=False,
                  gamma=3.2, gamma_min=None, gamma_max=None, h=0.0,
                  has_noise=False)
        f_wow = jax.jit(lambda a: wow_core(a, zero, **st)[0])
        report("wow_core L10 end-to-end", timeit(f_wow, x), 23 * img_b)


def probe_stack():
    """Reproduction for ops/layout.py: jnp.stack (expand_dims +
    concatenate) vs the reshape + concatenate form used by
    stack_planes, on 11 4k² f32 planes."""
    import numpy as np

    from wavelets_tpu.ops.layout import stack_planes

    rng = np.random.default_rng(0)
    rows = [jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32))
            for _ in range(11)]
    sync(rows[-1])
    moved = 2 * 11 * 4096 * 4096 * 4

    f_stack = jax.jit(lambda *r: jnp.stack(r, axis=0))
    report("jnp.stack 11 planes", timeit(lambda _: f_stack(*rows),
                                         rows[0]), moved)
    f_fast = jax.jit(lambda *r: stack_planes(r))
    report("stack_planes 11 planes", timeit(lambda _: f_fast(*rows),
                                            rows[0]), moved)


if __name__ == "__main__":
    import sys as _sys

    if "stack" in _sys.argv[1:]:
        probe_stack()
    else:
        main()
