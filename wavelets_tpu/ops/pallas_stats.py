"""Pallas TPU kernel: single-launch exact median via rank-count bisection.

``jnp.median`` (XLA sort) is pathologically slow for large planes on
TPU, and on this platform every separate kernel launch costs
milliseconds — so a bisection that launches one rank-count kernel per
pass pays ~10 launch overheads.  This kernel instead exploits the
*sequential* execution of the TPU Pallas grid to run the whole
selection in one launch: the grid is (frame, pass, chunk); SMEM scratch holds
the [lo, hi] bit-pattern interval, every chunk accumulates per-lane
rank counts for K interval buckets into VMEM scratch, and the last
chunk of each pass reduces the counts and narrows the interval.

numpy's even-count median needs both middle order statistics; only the
lower one is bisected.  The final grid pass recovers the upper one with
a conditional min (the smallest element strictly greater than the lower
statistic, or the statistic itself when duplicated past the midpoint) —
one extra streaming read instead of a second 10-pass search.

Notes that make this fast on the VPU:
* comparisons run on the int32 bit patterns (order-isomorphic for
  non-negative floats);
* bucket boundaries use shifts (K a power of two), never division;
* per-chunk reductions are sublane-only (per-lane counts); reductions
  to scalars happen once per pass, not per chunk.

Used by ``ops.stats.median_abs`` on TPU."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["median_bits2"]

#: bucket fanout per pass.  The VPU cost is K compares+adds per element
#: per pass while the pass count grows only as 31/log2(K), so total
#: compute ∝ K/log2(K): K=8 needs 12 passes but ~1.7x fewer VPU ops
#: than K=16's 10 passes — measured faster on v5e (the kernel is
#: compute-bound; the extra passes ride ~940 GB/s reads).
K = 8
LOGK = 3
N_PASS = 12  # span/K per pass (+O(K) flooring slack, then width-1)
MAXPAT = 2 ** 31 - 1


def _make_kernel(CH: int, SEC: int, cols: int, n_chunks: int):
    def kernel(ks_ref, bits_ref, out_ref, state, counts, lanemin):
        b = pl.program_id(0)
        p = pl.program_id(1)
        c = pl.program_id(2)

        @pl.when((p == 0) & (c == 0))
        def _():
            state[0, 0] = 0
            state[0, 1] = MAXPAT

        @pl.when(c == 0)
        def _():
            counts[...] = jnp.zeros((K, cols), jnp.float32)
            lanemin[...] = jnp.full((8, cols), MAXPAT, jnp.int32)

        # ---- passes 0..N_PASS-1: bisection of the lower statistic ----
        @pl.when(p < N_PASS)
        def _():
            lo = state[0, 0]
            hi = state[0, 1]
            step = jnp.maximum((hi - lo) >> LOGK, 1)
            bounds = [jnp.minimum(lo + (j + 1) * step - 1, hi)
                      for j in range(K - 1)] + [hi]

            for sec in range(CH // SEC):
                v = bits_ref[0, sec * SEC:(sec + 1) * SEC, :]
                rows = [jnp.sum((v <= bounds[j]).astype(jnp.float32),
                                axis=0, keepdims=True)
                        for j in range(K)]
                counts[...] += jnp.concatenate(rows, axis=0)

            @pl.when(c == n_chunks - 1)
            def _():
                k = ks_ref[0]
                lo0 = state[0, 0]
                new_lo = lo0
                new_hi = state[0, 1]
                found = jnp.zeros((), jnp.bool_)
                prev_bound = lo0 - 1
                for j in range(K):
                    cnt = jnp.sum(counts[j, :]).astype(jnp.int32)
                    hit = (~found) & (cnt >= k + 1)
                    new_hi = jnp.where(hit, bounds[j], new_hi)
                    new_lo = jnp.where(hit, prev_bound + 1, new_lo)
                    found = found | hit
                    prev_bound = bounds[j]
                state[0, 0] = new_lo
                state[0, 1] = new_hi

        # ---- final pass: count ≤ v_lo and min of elements > v_lo ----
        @pl.when(p == N_PASS)
        def _():
            pat = state[0, 1]  # converged: lo == hi == lower statistic
            for sec in range(CH // SEC):
                v = bits_ref[0, sec * SEC:(sec + 1) * SEC, :]
                counts[0:1, :] += jnp.sum(
                    (v <= pat).astype(jnp.float32), axis=0, keepdims=True)
                gt = jnp.where(v > pat, v, MAXPAT)
                g0 = 0
                while g0 < SEC:
                    g = min(8, SEC - g0)
                    lanemin[0:g, :] = jnp.minimum(
                        lanemin[0:g, :], gt[g0:g0 + g, :])
                    g0 += g

            @pl.when(c == n_chunks - 1)
            def _():
                cnt_le = jnp.sum(counts[0, :]).astype(jnp.int32)
                min_gt = jnp.min(lanemin[...])
                k_hi = ks_ref[1]
                upper = jnp.where(cnt_le >= k_hi + 1, pat, min_gt)
                out_ref[b, 0] = pat
                out_ref[b, 1] = upper

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def median_bits2(bits: jax.Array, ks: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """Bit patterns (int32, non-negative) of the two order statistics
    ``ks = [k_lo, k_hi]`` (k_hi ∈ {k_lo, k_lo+1}) per frame.  ``bits``
    is ``(rows, 1024)`` → returns ``(2,)``, or batched ``(B, rows,
    1024)`` → ``(B, 2)`` (per-frame selection; the batch rides a leading
    sequential grid dimension, still one kernel launch)."""
    batched = bits.ndim == 3
    if not batched:
        bits = bits[None]
    B, rows, cols = bits.shape
    CH = 1024
    while rows % CH:
        CH //= 2
    SEC = min(128, CH)
    n_chunks = rows // CH
    grid = (B, N_PASS + 1, n_chunks)
    out = pl.pallas_call(
        _make_kernel(CH, SEC, cols, n_chunks),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((B, 2), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CH, cols), lambda b, p, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.SMEM((1, 2), jnp.int32),
            pltpu.VMEM((K, cols), jnp.float32),
            pltpu.VMEM((8, cols), jnp.int32),
        ],
        interpret=interpret,
    )(ks, bits)
    return out if batched else out[0]
