"""Distributed reductions for the sharded pipelines.

The global reductions in WOW/denoise (SURVEY §3.3) become collectives
here: moments / min / max are plain ``psum``/``pmax``, and the MAD noise
estimator's **exact median** is computed without gathering the plane: a
bisection on the *bit patterns* of the non-negative values (IEEE floats
≥ 0 order like their integer bits), counting ranks with ``psum`` at each
step.  This yields the exact k-th order statistic across all shards with
O(bits) scalar collectives and O(local) work per step — no all_gather of
an 8k×8k plane.

All functions support leading batch dimensions (``batch_ndim``): the
reduction runs per batch element over the remaining local axes plus the
named mesh axes, so a frame stack sharded over a ``data`` axis keeps
per-frame statistics (reductions never cross the data axis)."""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "kth_smallest",
    "distributed_median",
    "distributed_mean",
    "distributed_std",
    "distributed_min",
    "distributed_max",
]

AxisNames = Union[str, Sequence[str]]


def _uint_dtype(dtype):
    return {2: jnp.uint16, 4: jnp.uint32, 8: jnp.uint64}[
        jnp.dtype(dtype).itemsize]


def _red_axes(a: jax.Array, batch_ndim: int):
    return tuple(range(batch_ndim, a.ndim))


def kth_smallest(a: jax.Array, k, axis_names: AxisNames,
                 batch_ndim: int = 0) -> jax.Array:
    """Exact k-th (0-indexed) smallest element of non-negative ``a``
    across all shards of ``axis_names`` and all local non-batch axes.

    Bisection over integer bit patterns: the invariant is that the
    answer's pattern lies in [lo, hi]; each of the ``itemsize·8`` steps
    halves the interval using a psum'd rank count.  ``k`` may be traced;
    result shape is ``a.shape[:batch_ndim]``."""
    nbits = jnp.dtype(a.dtype).itemsize * 8
    udt = _uint_dtype(a.dtype)
    bits = lax.bitcast_convert_type(a, udt)
    bshape = a.shape[:batch_ndim]
    expand = (...,) + (None,) * (a.ndim - batch_ndim)
    red = _red_axes(a, batch_ndim)
    k = jnp.asarray(k)

    def body(_, state):
        lo, hi = state
        mid = lo + (hi - lo) // 2
        cnt = lax.psum(jnp.sum(bits <= mid[expand], axis=red), axis_names)
        take_low = cnt >= k + 1
        return (jnp.where(take_low, lo, mid + 1),
                jnp.where(take_low, mid, hi))

    # The initial interval must carry the same varying-axes type as the
    # body's output under shard_map: varying over any batch (data) axes of
    # the input, replicated over the reduction axes.  A psum'd
    # data-derived zero has exactly that type.
    zero = lax.psum(jnp.min(bits, axis=red), axis_names) * 0
    lo0 = zero
    hi0 = zero + (~jnp.zeros((), udt) >> 1)  # sign bit clear
    _, hi = lax.fori_loop(0, nbits, body, (lo0, hi0))
    return lax.bitcast_convert_type(hi, a.dtype)


def distributed_median(a: jax.Array, axis_names: AxisNames,
                       total_count: int, batch_ndim: int = 0) -> jax.Array:
    """Exact global median of non-negative ``a`` (numpy semantics: mean of
    the two middle order statistics for even counts).  ``total_count`` is
    the static global per-batch element count."""
    k_lo = (total_count - 1) // 2
    k_hi = total_count // 2
    lo = kth_smallest(a, k_lo, axis_names, batch_ndim)
    if k_hi == k_lo:
        return lo
    hi = kth_smallest(a, k_hi, axis_names, batch_ndim)
    return (lo + hi) / 2


def distributed_mean(a: jax.Array, axis_names: AxisNames,
                     total_count: int, batch_ndim: int = 0) -> jax.Array:
    return lax.psum(jnp.sum(a, axis=_red_axes(a, batch_ndim)),
                    axis_names) / total_count


def distributed_std(a: jax.Array, axis_names: AxisNames,
                    total_count: int, batch_ndim: int = 0) -> jax.Array:
    """Global std (numpy ddof=0) via psum'd moments."""
    mean = distributed_mean(a, axis_names, total_count, batch_ndim)
    expand = (...,) + (None,) * (a.ndim - batch_ndim)
    var = lax.psum(
        jnp.sum((a - mean[expand]) ** 2, axis=_red_axes(a, batch_ndim)),
        axis_names) / total_count
    return jnp.sqrt(var)


def distributed_min(a: jax.Array, axis_names: AxisNames,
                    batch_ndim: int = 0) -> jax.Array:
    return lax.pmin(jnp.min(a, axis=_red_axes(a, batch_ndim)), axis_names)


def distributed_max(a: jax.Array, axis_names: AxisNames,
                    batch_ndim: int = 0) -> jax.Array:
    return lax.pmax(jnp.max(a, axis=_red_axes(a, batch_ndim)), axis_names)
