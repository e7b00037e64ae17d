"""Timing and roofline instrumentation.

The reference has no tracing/profiling at all (SURVEY §5); for a
production engine the per-stage cost and the distance to the hardware
roofline are first-class outputs.  This module provides:

* :class:`StageTimer` — wall-clock stage timing with *forced* device
  synchronization (a jitted scalar reduction + host transfer; on
  tunneled PJRT backends ``block_until_ready`` may not actually wait —
  measured on the axon platform, see bench.py),
* analytic cost models (bytes moved / FLOPs) for the dilated-conv
  transform and the WOW pipeline,
* :func:`roofline` — measured time vs the bandwidth/compute bound.

Peak numbers default to TPU v5e per-chip specs and can be overridden.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.filters import ScalingFunction

__all__ = ["StageTimer", "Cost", "decompose_cost", "wow_cost",
           "roofline", "device_sync", "trace"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a ``jax.profiler`` trace of the enclosed block (view with
    TensorBoard / Perfetto).  No-op if the backend does not support
    profiling (some tunneled PJRT platforms)."""
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass

#: TPU v5e per-chip peaks (public spec): 394 bf16 TFLOP/s ⇒ ~197 f32
#: via VPU+MXU mix is not meaningful for stencils — the relevant compute
#: bound is the VPU; HBM bandwidth 819 GB/s.
V5E_HBM_GBPS = 819.0
V5E_VPU_GFLOPS = 3940.0  # 8x128 lanes × ~0.94 GHz × 4 ops (FMA×2 issue)


_sync_fn = None


def device_sync(x: Optional[jax.Array] = None) -> None:
    """Force completion of all queued device work.

    ``block_until_ready`` does not synchronize through some tunneled
    backends, so we run a jitted scalar reduction whose host transfer
    transitively waits on the dependency."""
    global _sync_fn
    if x is None:
        x = jnp.zeros((1,), jnp.float32)
    if _sync_fn is None:
        _sync_fn = jax.jit(lambda a: jnp.sum(a))
    float(_sync_fn(jnp.ravel(x)[:1]))


@dataclasses.dataclass
class Cost:
    """Analytic cost of a pipeline stage."""

    flops: float
    hbm_bytes: float

    def bound_ms(self, bw_gbps: float = V5E_HBM_GBPS,
                 flops_gflops: float = V5E_VPU_GFLOPS) -> float:
        """Roofline bound (ms): max of bandwidth and compute limits."""
        t_bw = self.hbm_bytes / (bw_gbps * 1e9)
        t_fl = self.flops / (flops_gflops * 1e9)
        return max(t_bw, t_fl) * 1e3

    def __add__(self, other: "Cost") -> "Cost":
        return Cost(self.flops + other.flops,
                    self.hbm_bytes + other.hbm_bytes)


def decompose_cost(shape: Tuple[int, ...], level: int,
                   sf: ScalingFunction, itemsize: int = 4) -> Cost:
    """Ideal cost of an ``level``-scale decomposition: read the image
    once, write level+1 planes, with 2·k taps of FMA per element per
    scale (separable passes)."""
    n = float(np.prod(shape))
    k = len(sf.taps)
    flops = n * level * 2 * (2 * k)  # two 1-D passes, mul+add per tap
    bytes_ = n * itemsize * (1 + (level + 1))
    return Cost(flops, bytes_)


def wow_cost(shape: Tuple[int, ...], n_scales: int, sf: ScalingFunction,
             denoise: bool = False, itemsize: int = 4) -> Cost:
    """Ideal cost of standard WOW: decomposition + per-scale local power
    smoothing + elementwise whitening + synthesis."""
    n = float(np.prod(shape))
    k = len(sf.taps)
    c = decompose_cost(shape, n_scales, sf, itemsize)
    # local power smooth per detail scale + elementwise ops
    flops = c.flops + n * n_scales * (2 * (2 * k) + 8)
    # planes are re-read and re-written once by the whiten stage +
    # recon written
    bytes_ = c.hbm_bytes + n * itemsize * (2 * (n_scales + 1) + 1)
    if denoise:
        flops += n * 10  # median passes + significance
        bytes_ += n * itemsize * 10
    return Cost(flops, bytes_)


class StageTimer:
    """Collects per-stage wall times with forced device sync.

    >>> t = StageTimer()
    >>> with t.stage("decompose"):
    ...     planes = decompose(x, 6, B3SPLINE)
    >>> t.report()
    """

    def __init__(self):
        self.times: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync_on: Optional[jax.Array] = None):
        device_sync()
        t0 = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            device_sync(box.get("out", sync_on))
            self.times.setdefault(name, []).append(
                time.perf_counter() - t0)

    def report(self) -> str:
        lines = []
        for name, ts in self.times.items():
            best = min(ts) * 1e3
            lines.append(f"{name:30s} {best:9.3f} ms (best of {len(ts)})")
        return "\n".join(lines)


def roofline(fn: Callable, args: tuple, cost: Cost, iters: int = 10,
             bw_gbps: float = V5E_HBM_GBPS,
             flops_gflops: float = V5E_VPU_GFLOPS) -> Dict[str, float]:
    """Measure ``fn(*args)`` steady-state (chained when the output shape
    matches the first input, else repeated) and compare to the roofline
    bound for ``cost``."""
    out = fn(*args)
    device_sync(out if isinstance(out, jax.Array) else None)
    chained = (isinstance(out, jax.Array) and len(args) >= 1
               and isinstance(args[0], jax.Array)
               and out.shape == args[0].shape and out.dtype == args[0].dtype)
    t0 = time.perf_counter()
    if chained:
        x = args[0]
        for _ in range(iters):
            x = fn(x, *args[1:])
        device_sync(x)
    else:
        for _ in range(iters):
            out = fn(*args)
        device_sync(out if isinstance(out, jax.Array) else None)
    dt = (time.perf_counter() - t0) / iters
    bound = cost.bound_ms(bw_gbps, flops_gflops) / 1e3
    return {
        "measured_ms": dt * 1e3,
        "bound_ms": bound * 1e3,
        "roofline_fraction": bound / dt if dt > 0 else 0.0,
        "achieved_gbps": cost.hbm_bytes / dt / 1e9,
        "achieved_gflops": cost.flops / dt / 1e9,
    }


def count_collectives(fn: Callable, *args) -> Dict[str, int]:
    """Count communication ops in the compiled (post-SPMD-partitioner)
    HLO of ``jax.jit(fn)(*args)``.

    Validates the scaling model's per-config collective counts
    (DESIGN.md "Multi-chip scaling model") at trace level: the driver's
    virtual-mesh dryrun asserts the compiled program contains exactly
    the halos/reductions the model prices — no hidden resharding.
    Counts ``-start`` forms once (async pairs are one collective)."""
    import re

    txt = jax.jit(fn).lower(*args).compile().as_text()
    counts: Dict[str, int] = {}
    for op in ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all"):
        n = len(re.findall(rf"\b{op}(?:-start)?\(", txt))
        done = len(re.findall(rf"\b{op}-done\(", txt))
        counts[op] = n - done if n > done else n
    return counts
