"""Pallas TPU kernel: fused multi-scale *bilateral* à trous decomposition.

The reference's bilateral hot loop (watroo/wavelets.py:84-105) makes
``k²−1`` shifted passes per scale, each materializing a shifted copy and
an exp range weight (numexpr); the XLA rewrite (ops/conv.py
``atrous_conv_nd``) fuses them into one elementwise program but still
*reads* ``k²`` overlapping shifted streams from HBM — measured on the
axon v5e, those redundant reads (not the exps: 24 exps/px cost 0.3 ms
at 4k, the shifted reads 1.4 ms) dominate the 4.15 ms/scale step.

This kernel keeps each tile plus halo VMEM-resident and runs the whole
per-scale chain on-chip:

1. local variance (``sdev_loc``): two separable smooths (mean and
   mean-of-squares) with the per-scale dilated taps, the ``≤0 → 1e-20``
   clamp, and the static ``σ_b[s]²`` (· ``s+1`` under bilateral
   scaling) range-variance factor (watroo/wavelets.py:24-32, 434-440);
2. the ``k²−1``-tap bilateral accumulation ``Σ k_t·exp(−Δ²/2V)·x_t``
   with its normalizer — every shifted read comes from VMEM;
3. detail plane ``c_s − c_{s+1}`` written through the revolving
   BlockSpec window; the smooth chains to the next scale on-chip.

Correctness contract is the same garbage-creep/overlap-save argument as
``pallas_conv``: the sdev smooth and the tap loop both read the *same*
``cur`` (no chaining between them), so the valid interior shrinks by
``hw·2^s`` per side per scale and the group halo is
``R = hw·2^offset·(2^g − 1)``; image borders
re-mirror the *current* smooth in-kernel (per-scale symmetric pad
semantics), using the exact anti-diagonal-matmul flip.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .filters import ScalingFunction
from .pallas_conv import (
    N_SLOTS,
    _aligned_halos,
    _exact_dot,
    _exact_dot_left,
    _flip_mats,
)

__all__ = ["fused_bilateral_pieces", "can_fuse_bilateral",
           "plan_bilateral_groups"]

#: largest fused bilateral group (R = hw·(2^g−1) halo at offset 0)
MAX_BILATERAL_LEVELS = 5

#: row-strip height for the tap loop's value DAG (bounds Mosaic temps)
STRIP = 64


def _conv_pass(src_ref, dst_ref, taps, d: int, axis: int,
               square: bool = False, lo: int = 0):
    """One 1-D dilated conv pass between full-window VMEM refs; writes
    the interior ``[lo + hw·d, n − lo − hw·d)`` along ``axis`` (``lo``
    is the creep already accumulated — computing into known-garbage
    regions is wasted VPU work).  ``square=True`` convolves the
    elementwise square of the source (for the mean-of-squares pass
    without a materialized x² buffer)."""
    hw = (len(taps) - 1) // 2
    n = src_ref.shape[axis]
    m = lo + hw * d

    def sl(a, b):
        v = src_ref[a:b, :] if axis == 0 else src_ref[:, a:b]
        v = v.astype(jnp.float32)
        return v * v if square else v

    out = sl(m, n - m) * taps[hw]
    for j in range(1, hw + 1):
        out = out + taps[hw + j] * (sl(m - j * d, n - m - j * d)
                                    + sl(m + j * d, n - m + j * d))
    out = out.astype(dst_ref.dtype)
    if axis == 0:
        dst_ref[m:n - m, :] = out
    else:
        dst_ref[:, m:n - m] = out


def _tap_offsets(hw: int):
    offs = []
    for dy in range(-hw, hw + 1):
        for dx in range(-hw, hw + 1):
            if dy == 0 and dx == 0:
                continue
            offs.append((dy, dx))
    return offs


def _make_kernel(level: int, taps: Tuple[float, ...],
                 variances: Tuple[float, ...], TH: int, TW: int,
                 R: int, offset: int):
    """``variances[s]``: static per-scale range-variance factor
    σ_b[s+offset]²·(scale factor), multiplying the local variance."""
    hw = (len(taps) - 1) // 2
    Rr, Rc = _aligned_halos(R)
    center = taps[hw] ** 2
    tap_k = {(dy, dx): taps[hw + dy] * taps[hw + dx]
             for dy in range(-hw, hw + 1) for dx in range(-hw, hw + 1)}

    def kernel(x_hbm, out_ref, bufs, tmp_ref, mean_ref, m2_ref, sm_ref,
               sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        ni = pl.num_programs(1)
        nj = pl.num_programs(2)
        nsteps = pl.num_programs(0) * ni * nj
        step = (b * ni + i) * nj + j
        slot = step % N_SLOTS

        def in_dma(st, which):
            bb = which // (ni * nj)
            rem = which % (ni * nj)
            ii = rem // nj
            jj = rem % nj
            return pltpu.make_async_copy(
                x_hbm.at[bb,
                         pl.ds(ii * TH, TH + 2 * Rr),
                         pl.ds(jj * TW, TW + 2 * Rc)],
                bufs.at[st], sems.at[st])

        @pl.when(step == 0)
        def _():
            in_dma(slot, step).start()

        @pl.when(step + 1 < nsteps)
        def _():
            in_dma((step + 1) % N_SLOTS, step + 1).start()

        in_dma(slot, step).wait()

        Jr = _flip_mats(Rr, bufs.dtype)
        Jc = _flip_mats(Rc, bufs.dtype)
        nr = TH + 2 * Rr
        nc = TW + 2 * Rc
        refs = [bufs.at[slot], sm_ref]
        cur = refs[0]
        for s in range(level):
            sm = refs[1]
            if s > 0:
                # re-mirror the image-border halo with the current
                # smooth (per-scale symmetric pad semantics)
                @pl.when(j == 0)
                def _():
                    cur[:, 0:Rc] = _exact_dot(cur[:, Rc:2 * Rc], Jc)

                @pl.when(j == nj - 1)
                def _():
                    cur[:, Rc + TW:nc] = _exact_dot(
                        cur[:, TW:TW + Rc], Jc)

                @pl.when(i == 0)
                def _():
                    cur[0:Rr, :] = _exact_dot_left(Jr, cur[Rr:2 * Rr, :])

                @pl.when(i == ni - 1)
                def _():
                    cur[Rr + TH:nr, :] = _exact_dot_left(
                        Jr, cur[TH:TH + Rr, :])

            d = 2 ** (s + offset)
            # creep already accumulated before this scale; compute only
            # the still-valid interior
            crp = hw * (2 ** offset) * (2 ** s - 1)
            m = crp + hw * d
            # local variance under the scale-s window
            _conv_pass(cur, tmp_ref, taps, d, 0, lo=crp)
            _conv_pass(tmp_ref, mean_ref, taps, d, 1, lo=crp)
            _conv_pass(cur, tmp_ref, taps, d, 0, square=True, lo=crp)
            _conv_pass(tmp_ref, m2_ref, taps, d, 1, lo=crp)

            # bilateral tap accumulation, processed in row strips so the
            # value DAG's Mosaic temps stay bounded (~6 strip-sized f32
            # values) — a full-window value DAG blew the 16 MB scoped
            # limit, and per-tap VMEM read-modify-write accumulators
            # were ~3x slower (load/store bound)
            r0 = m
            while r0 < nr - m:
                rs = min(STRIP, nr - m - r0)
                rows = slice(r0, r0 + rs)
                mu = mean_ref[rows, m:nc - m].astype(jnp.float32)
                q = m2_ref[rows, m:nc - m].astype(jnp.float32)
                vari = q - mu * mu
                vari = jnp.where(vari <= 0, jnp.float32(1e-20), vari)
                inv2v = jnp.float32(0.5 / variances[s]) / vari
                ci = cur[rows, m:nc - m].astype(jnp.float32)
                acc = ci * jnp.float32(center)
                nrm = jnp.full_like(ci, jnp.float32(center))
                for (dy, dx) in _tap_offsets(hw):
                    sh = cur[r0 + dy * d:r0 + rs + dy * d,
                             m + dx * d:nc - m + dx * d].astype(
                                 jnp.float32)
                    diff = ci - sh
                    w = jnp.float32(tap_k[(dy, dx)]) * jnp.exp(
                        -(diff * diff) * inv2v)
                    nrm = nrm + w
                    acc = acc + w * sh
                sm[rows, m:nc - m] = (acc / nrm).astype(cur.dtype)
                r0 += rs
            out_ref[s, 0] = (cur[Rr:Rr + TH, Rc:Rc + TW]
                             - sm[Rr:Rr + TH, Rc:Rc + TW])
            refs = [sm, cur]
            cur = refs[0]
        out_ref[level, 0] = cur[Rr:Rr + TH, Rc:Rc + TW]

    return kernel


def _group_halo(hw: int, offset: int, g: int) -> int:
    """Reach of a fused bilateral group: per scale the sdev smooth and
    the tap loop both read the *same* ``cur`` (no chaining between
    them), so validity shrinks by ``hw·2^s`` per side per scale — the
    same creep as the plain decompose: ``hw·2^offset·(2^g − 1)``."""
    return hw * (2 ** offset) * ((2 ** g) - 1)


def _vmem_bytes(TH: int, TW: int, level: int, R: int,
                itemsize: int = 4) -> int:
    """Input slots + tmp/mean/m2/sm windows + strip-sized f32 value
    temps in the tap loop (Mosaic keeps ~2 live per tap: measured ~5 MB
    at STRIP=128, (TW+2Rc)=384) + revolving output window."""
    Rr, Rc = _aligned_halos(R)
    window = (TH + 2 * Rr) * (TW + 2 * Rc)
    buf = window * itemsize
    strips = 28 * STRIP * (TW + 2 * Rc) * 4
    out_win = 2 * (level + 1) * TH * TW * itemsize
    return (N_SLOTS + 4) * buf + strips + out_win


#: measured platform constants (axon v5e): the 24-tap loop + sdev
#: smooths cost ~250 VPU ops/px/scale; per-grid-step scalar sequencing;
#: per-kernel-launch latency; XLA bilateral step ~4.15 ms at 4k²
_VPU_OPS_SCALE = 300
_VPU = 3.5e12
_STEP_OVH = 6e-6
_LAUNCH_OVH = 0.4e-3
_BW = 700e9
_XLA_BILATERAL_SCALE_BYTES = 43.0  # ≈ 4.15 ms · 700 GB/s / 67 MB


def _group_cost(H, W, g, R, TH, TW, itemsize):
    """Seconds for one fused bilateral group over the full image."""
    Rr, Rc = _aligned_halos(R)
    steps = (H // TH) * (W // TW)
    amp = (TH + 2 * Rr) * (TW + 2 * Rc) / (TH * TW)
    bytes_ = H * W * itemsize * (amp + g + 1)
    vpu = H * W * amp * g * _VPU_OPS_SCALE
    return (max(bytes_ / _BW, vpu / _VPU) + steps * _STEP_OVH
            + _LAUNCH_OVH)


def _plan_tiles(H: int, W: int, level: int, R: int,
                itemsize: int = 4,
                budget: int = 13 << 20) -> Optional[Tuple[int, int]]:
    cands = []
    for TH in (512, 256, 128):
        if H % TH:
            continue
        for TW in (512, 256, 128):
            if W % TW:
                continue
            if max(_aligned_halos(R)) > min(TH, TW):
                continue
            if _vmem_bytes(TH, TW, level, R, itemsize) <= budget:
                cands.append(
                    (_group_cost(H, W, level, R, TH, TW, itemsize),
                     TH, TW))
    if not cands:
        return None
    _, TH, TW = min(cands)
    return TH, TW


def plan_bilateral_groups(H: int, W: int, level: int, hw: int,
                          itemsize: int = 4):
    """Cost-model DP partition of ``level`` bilateral scales into fused
    groups (mirrors ``pallas_conv.plan_groups``); returns
    ``(groups, n_tail)``.  A group is scheduled only where it beats the
    measured XLA bilateral step cost for those scales."""
    INF = float("inf")
    # fixed floor: the XLA step's pads/launch overheads do not shrink
    # with the image (measured 1k-fused beats 1k-XLA ~1.7x e2e)
    xla_scale = (_XLA_BILATERAL_SCALE_BYTES * H * W * itemsize / _BW
                 + 0.25e-3)
    best = [(0.0, None)] * (level + 1)
    for s in range(level - 1, -1, -1):
        cands = [((level - s) * xla_scale, None)]
        for g in range(1, min(level - s, MAX_BILATERAL_LEVELS) + 1):
            R = _group_halo(hw, s, g)
            tiles = _plan_tiles(H, W, g, R, itemsize)
            if tiles is None:
                continue
            c = _group_cost(H, W, g, R, *tiles, itemsize)
            if s + g < level:
                c += 2 * H * W * itemsize / _BW  # residual round trip
            cands.append((c + best[s + g][0], g))
        best[s] = min(cands, key=lambda t: t[0])
    groups = []
    s = 0
    while s < level and best[s][1] is not None:
        groups.append((s, best[s][1]))
        s += best[s][1]
    return groups, level - s


def can_fuse_bilateral(x, level: int, sf: ScalingFunction, axes,
                       boundary: str,
                       backend: Optional[str] = None) -> bool:
    """Fused bilateral dispatch: TPU, 2-D (or batched 2-D) f32,
    symmetric boundary, tileable shape."""
    if level < 1 or boundary != "symmetric":
        return False
    spatial = tuple(range(x.ndim - 2, x.ndim))
    if x.ndim not in (2, 3) or (axes is not None
                                and tuple(axes) != spatial):
        return False
    if x.dtype != jnp.float32:
        return False
    if backend is None:
        backend = jax.default_backend()
    if backend in ("cpu",):
        return False
    groups, _ = plan_bilateral_groups(x.shape[-2], x.shape[-1], level,
                                      sf.half_width)
    return bool(groups)


@functools.partial(
    jax.jit,
    static_argnames=("level", "sf", "variances", "offset", "interpret"))
def _fused_group(x: jax.Array, level: int, sf: ScalingFunction,
                 variances: Tuple[float, ...], offset: int = 0,
                 interpret: bool = False) -> jax.Array:
    """Fused bilateral decomposition of ``level`` scales at dilation
    base ``2^offset``; ``variances[s]`` is the static range-variance
    factor for group-local scale ``s``.  ``x``: ``(H, W)`` or
    ``(B, H, W)``; returns ``(level+1, *x.shape)``."""
    batched = x.ndim == 3
    xb = x if batched else x[None]
    B, H, W = xb.shape
    R = _group_halo(sf.half_width, offset, level)
    TH, TW = _plan_tiles(H, W, level, R, x.dtype.itemsize)
    Rr, Rc = _aligned_halos(R)
    xp = jnp.pad(xb, ((0, 0), (Rr, Rr), (Rc, Rc)), mode="symmetric")
    kernel = _make_kernel(level, sf.taps, variances, TH, TW, R, offset)
    grid = (B, H // TH, W // TW)
    dt = x.dtype
    out = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((level + 1, B, H, W), dt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (level + 1, 1, TH, TW),
            lambda b, i, j: (0, b, i, j),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((N_SLOTS, TH + 2 * Rr, TW + 2 * Rc), dt),
            pltpu.VMEM((TH + 2 * Rr, TW + 2 * Rc), dt),
            pltpu.VMEM((TH + 2 * Rr, TW + 2 * Rc), dt),
            pltpu.VMEM((TH + 2 * Rr, TW + 2 * Rc), dt),
            pltpu.VMEM((TH + 2 * Rr, TW + 2 * Rc), dt),
            pltpu.SemaphoreType.DMA((N_SLOTS,)),
        ],
        interpret=interpret,
    )(xp)
    return out if batched else out[:, 0]


def fused_bilateral_pieces(
    x: jax.Array,
    level: int,
    sf: ScalingFunction,
    bilateral: Tuple[float, ...],
    bilateral_scaling: bool = False,
    *,
    interpret: bool = False,
    xla_tail=None,
    defer_tail: bool = False,
):
    """Bilateral decomposition as ``(pieces, layout, tail)`` — the
    bilateral counterpart of ``pallas_conv.fused_decompose_pieces``.
    ``bilateral[s]`` is the per-scale σ_b (already normalized,
    core.transform.normalize_bilateral)."""
    H, W = x.shape[-2:]
    groups, n_tail = plan_bilateral_groups(H, W, level, sf.half_width,
                                           x.dtype.itemsize)

    def var_factor(s):
        v = float(bilateral[s]) ** 2
        return v * (s + 1) if bilateral_scaling else v

    pieces = []
    layout = {}
    cur = x
    for offset, g in groups:
        variances = tuple(var_factor(offset + s) for s in range(g))
        planes = _fused_group(cur, g, sf, variances, offset=offset,
                              interpret=interpret)
        for s in range(g):
            layout[offset + s] = (len(pieces), s)
        pieces.append(planes)
        cur = planes[g]
    if n_tail and defer_tail:
        return pieces, layout, (cur, n_tail)
    if n_tail:
        assert xla_tail is not None
        tail = xla_tail(cur, n_tail, level - n_tail)
        for s in range(n_tail + 1):
            layout[level - n_tail + s] = (len(pieces), s)
        pieces.append(tail)
    else:
        layout[level] = (len(pieces) - 1, groups[-1][1])
    return pieces, layout, None
