"""Pallas TPU kernel: fused deep-scale WOW whitening steps.

The deferred-tail scales of WOW (``models/wow.py``) are the scales whose
dilation ``2^s`` is too wide for the VMEM halo windows of the fused
decompose/whiten kernels (``s ≥ 6`` at 4k² for B3spline).  They
previously ran per scale on the XLA shift-add path — the chain smooth
and the local-power smooth each round-trip HBM, ~2.2 ms/scale at 4k² f32
on the axon v5e — dominating the 10-scale headline pipeline
(watroo/utils.py:174-203 is the reference loop being fused here).

This kernel computes ONE deep scale per launch with *bounded* VMEM.  A
contiguous halo window would need ``4·hw·2^s`` extra rows (impossible in
VMEM for ``s ≥ 7``), but the dilated row pass only reads rows at offsets
``m·2^s``: when the block height ``T`` divides the dilation ``D``, those
are whole row *blocks*.  The grid therefore walks full-width row blocks
and reads NINE windows of the carry at block offsets ``m·D/T``,
``m = −2hw..2hw`` (chain smooth reach plus power-smooth reach).
Symmetric reflection at the image top/bottom maps aligned blocks to
aligned blocks with reversed rows: the BlockSpec index map computes the
reflected block index and the kernel conditionally reverses rows with
the exact anti-diagonal MXU mirror (Mosaic cannot lower ``rev``).

Per block, entirely in VMEM: the chain smooth at the five row offsets
the power smooth needs (the 5× recompute is the price of bounded VMEM —
the VPU absorbs it under the DMA), the detail difference, the dilated
local-power smooth, the significance mask, the whitening multiply, and
the partial-reconstruction accumulation.  Column (W) reflection: rows
are full width, so the dilated column pass runs on an extended scratch
whose mirror edges are filled by 128-lane chunked flips (exact bf16×3
anti-diagonal matmuls).  The residual plane's global-std normalization
stays in XLA (one global reduction).

Numerics match the XLA deferred-tail step exactly for unmasked scales
(same tap fold order, same clamps); masked scales use the same
Abramowitz-Stegun erf as the fused whiten kernel (max err 1.5e-7).

v2 (ring): the nine-window BlockSpec grid refetches every carry block
up to nine times (no cross-slot reuse in the Mosaic pipeline) — ~9×
read amplification, the dominant cost of the deep scales at L10.  The
v2 kernel orders the grid by dilation *residue class*: blocks
``i ≡ c (mod D/T)`` couple only with blocks of the same class, so
consecutive class-ordered steps shift the nine-window set by one block
and a manual-DMA ring buffer fetches each block exactly once.
Symmetric reflection maps class ``c`` to class ``D/T−1−c``, so classes
are streamed in mirror *pairs* sharing one ring: every reflected window
is a row-flip of a block the pair has already fetched.  Read traffic
drops from ~9× to ~1× of the carry (plus the recon pass)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .filters import ScalingFunction
from .pallas_conv import _exact_dot, _exact_dot_left, _flip_mats
from .pallas_wow import _erf_pos

__all__ = ["deep_whiten_step", "can_deep", "deep_block_rows"]

#: VMEM ceiling for the per-step footprint in (T·W) f32 buffers: 9
#: double-buffered input windows + recon in + 3 double-buffered outputs
#: + live elementwise temps.  Calibrated on the v5e: (T·W) = 16·4096
#: compiles inside the full WOW program; 32·4096 fits standalone but
#: exceeds scoped VMEM (21 MB) when co-scheduled in the pipeline.
_FOOTPRINT_BUFS = 34
_VMEM_BUDGET = 12 << 20


def deep_block_rows(H: int, W: int, D: int) -> int:
    """Largest feasible block height: divides the dilation and the image
    height (so row offsets are whole, reflection-aligned blocks), is a
    sublane-tiling multiple, and fits the VMEM budget.  0 = infeasible."""
    for T in (32, 16, 8):
        if D % T or H % T:
            continue
        if _FOOTPRINT_BUFS * T * W * 4 <= _VMEM_BUDGET:
            return T
    return 0


def can_deep(carry: jax.Array, sf: ScalingFunction, scale: int,
             bilateral) -> bool:
    """Whether the fused deep-whiten step applies to this scale: plain
    (non-bilateral) chain, f32, 2-D or frame-batched, dilation a whole
    number of lane chunks, single-reflection geometry, feasible block."""
    if bilateral is not None or carry.dtype != jnp.float32:
        return False
    if carry.ndim not in (2, 3):
        return False
    H, W = carry.shape[-2:]
    D = 1 << scale
    hw = sf.half_width
    if W % 128 or (hw * D) % 128:
        return False
    if 2 * hw * D > H:  # block reflection must stay single-bounce
        return False
    return deep_block_rows(H, W, D) > 0


def _deep_compute(blocks, ext, thr_b, taps, D: int, W: int,
                  weight: float, soft: bool, masked: bool):
    """Shared deep-step compute on the nine assembled row windows:
    chain smooth at the five offsets the power smooth reads, detail
    difference, dilated local-power smooth, significance, whiten.
    Returns ``(white, c_next_center)``."""
    hw = (len(taps) - 1) // 2
    Rc = hw * D

    def hpass(at):
        # dilated row pass: offsets are whole blocks (T | D); tap
        # fold order matches ops/conv.separable_smooth_axis exactly
        c = 2 * hw + at
        out = blocks[c] * taps[hw]
        for j in range(1, hw + 1):
            out = out + taps[hw + j] * (blocks[c - j] + blocks[c + j])
        return out

    J128 = _flip_mats(128, jnp.float32)

    def wpass(val):
        # dilated column pass with in-kernel symmetric mirror: fill
        # the extended scratch's edges by 128-lane chunked flips
        ext[:, Rc:Rc + W] = val
        for k in range(Rc // 128):
            ext[:, Rc - (k + 1) * 128:Rc - k * 128] = _exact_dot(
                val[:, k * 128:(k + 1) * 128], J128)
            ext[:, Rc + W + k * 128:Rc + W + (k + 1) * 128] = \
                _exact_dot(val[:, W - (k + 1) * 128:W - k * 128], J128)
        out = val * taps[hw]
        for j in range(1, hw + 1):
            left = ext[:, Rc - j * D:Rc - j * D + W]
            right = ext[:, Rc + j * D:Rc + j * D + W]
            out = out + taps[hw + j] * (left + right)
        return out

    # chain smooth at the five row offsets the power smooth reads
    c_next = [wpass(hpass(m)) for m in range(-hw, hw + 1)]
    c_at = [blocks[2 * hw + m] - c_next[hw + m]
            for m in range(-hw, hw + 1)]

    # local power: smooth_s(c²) (watroo/utils.py:193-196); the row
    # pass folds the five squared offsets, the column pass mirrors
    pw = [c * c for c in c_at]
    tp = pw[hw] * taps[hw]
    for j in range(1, hw + 1):
        tp = tp + taps[hw + j] * (pw[hw - j] + pw[hw + j])
    lp = wpass(tp)
    lp = jnp.sqrt(jnp.where(lp <= 0, jnp.float32(1e-15), lp))

    wc = c_at[hw]
    if masked:
        safe_t = jnp.where(thr_b == 0, jnp.float32(1.0), thr_b)
        if soft:
            mask = _erf_pos(jnp.abs(wc) / safe_t)
        else:
            mask = (jnp.abs(wc) > safe_t).astype(jnp.float32)
        wc = wc * jnp.where(thr_b == 0, jnp.float32(1.0), mask)
    return wc * (weight / lp), c_next[hw]


def _make_deep_kernel(taps, T: int, W: int, D: int, NB: int,
                      weight: float, soft: bool, masked: bool,
                      write_plane: bool, accum: bool = True):
    hw = (len(taps) - 1) // 2
    nblk = 4 * hw + 1
    DT = D // T

    def kernel(*refs):
        thr_ref = refs[0]
        carry_refs = refs[1:1 + nblk]
        refs = refs[1 + nblk:]
        if accum:
            recon_ref, cnext_ref, recon_out = refs[:3]
            refs = refs[3:]
        else:
            recon_ref = recon_out = None
            cnext_ref = refs[0]
            refs = refs[1:]
        plane_ref = refs[0] if write_plane else None
        ext = refs[1 if write_plane else 0]

        b = pl.program_id(0)
        i = pl.program_id(1)

        # row-reverse the windows whose block index was reflected by the
        # index map (symmetric pad of the *current* carry per scale,
        # watroo/wavelets.py:77 semantics)
        JT = _flip_mats(T, jnp.float32)
        blocks = []
        for m in range(-2 * hw, 2 * hw + 1):
            v = carry_refs[m + 2 * hw][0]
            idx = i + m * DT
            flag = jnp.logical_or(idx < 0, idx >= NB)
            blocks.append(jnp.where(flag, _exact_dot_left(JT, v), v))

        white, cnext = _deep_compute(blocks, ext, thr_ref[b], taps, D,
                                     W, weight, soft, masked)
        if accum:
            recon_out[0] = recon_ref[0] + white
        cnext_ref[0] = cnext
        if write_plane:
            plane_ref[0] = white

    return kernel


def _ring_rows(H: int, W: int, D: int) -> int:
    """v2 block height: divides the dilation and the image height with
    D/T ≥ 2 (mirror pairing needs an even class count) and a VMEM fit
    for the ring footprint (2 rings of nblk+1 blocks + outputs + ext +
    elementwise temps ≈ 36 T·W f32 buffers)."""
    for T in (32, 16, 8):
        if D % T or H % T or (D // T) < 2:
            continue
        if 36 * T * W * 4 <= _VMEM_BUDGET:
            return T
    return 0


def _make_ring_kernel(taps, T: int, W: int, D: int, M: int,
                      weight: float, soft: bool, masked: bool,
                      write_plane: bool, accum: bool = True):
    hw = (len(taps) - 1) // 2
    nblk = 4 * hw + 1
    RING = nblk + 1
    DT = D // T

    def kernel(*refs):
        thr_ref = refs[0]
        carry = refs[1]
        refs = refs[2:]
        if accum:
            recon_ref, cnext_ref, recon_out = refs[:3]
            refs = refs[3:]
        else:
            recon_ref = recon_out = None
            cnext_ref = refs[0]
            refs = refs[1:]
        plane_ref = refs[0] if write_plane else None
        s0 = 1 if write_plane else 0
        ring, ext, sems = refs[s0:s0 + 3]

        b = pl.program_id(0)
        p = pl.program_id(1)
        k = pl.program_id(2)
        cls = pl.program_id(3)
        c_pair = (p, DT - 1 - p)

        def dma(side, j, action):
            # class-step j of pair side `side` → row block c + j·DT
            c_val = c_pair[side]
            slot = (j % RING if isinstance(j, int)
                    else jax.lax.rem(j, jnp.int32(RING)))
            r0 = pl.multiple_of((c_val + j * DT) * T, 8)
            cp = pltpu.make_async_copy(
                carry.at[b, pl.ds(r0, T), :],
                ring.at[side, slot],
                sems.at[side, slot])
            getattr(cp, action)()

        # fetch/wait once per class-step (the cls==0 leg of each pair
        # step); each block is DMA'd exactly once per pair
        @pl.when(jnp.logical_and(cls == 0, k == 0))
        def _():
            for j in range(min(2 * hw + 2, M)):
                dma(0, j, "start")
                dma(1, j, "start")
            for j in range(min(2 * hw + 1, M)):
                dma(0, j, "wait")
                dma(1, j, "wait")

        @pl.when(jnp.logical_and(cls == 0, k > 0))
        def _():
            jf = k + 2 * hw + 1

            @pl.when(jf <= M - 1)
            def _():
                dma(0, jf, "start")
                dma(1, jf, "start")

            jw = k + 2 * hw

            @pl.when(jw <= M - 1)
            def _():
                dma(0, jw, "wait")
                dma(1, jw, "wait")

        # assemble the nine windows: in-range class-steps come from the
        # own ring; reflected steps are row-flips of the mirror ring
        # (symmetric pad maps class c to class DT−1−c)
        JT = _flip_mats(T, jnp.float32)
        blocks = []
        for m in range(-2 * hw, 2 * hw + 1):
            j = k + m
            edge = jnp.logical_or(j < 0, j >= M)
            jj = jnp.where(j < 0, -j - 1,
                           jnp.where(j >= M, 2 * M - 1 - j, j))
            slot = jax.lax.rem(jj.astype(jnp.int32), jnp.int32(RING))
            own = ring[cls, slot]
            mir = ring[1 - cls, slot]
            blocks.append(jnp.where(edge, _exact_dot_left(JT, mir), own))

        white, cnext = _deep_compute(blocks, ext, thr_ref[b], taps, D,
                                     W, weight, soft, masked)
        if accum:
            recon_out[0] = recon_ref[0] + white
        cnext_ref[0] = cnext
        if write_plane:
            plane_ref[0] = white

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("sf", "scale", "weight", "soft", "masked",
                     "write_plane", "interpret"))
def deep_whiten_step(
    carry: jax.Array,
    recon: jax.Array,
    threshold: jax.Array,
    *,
    sf: ScalingFunction,
    scale: int,
    weight: float,
    soft: bool = True,
    masked: bool = False,
    write_plane: bool = True,
    interpret: bool = False,
):
    """One deferred-tail WOW scale, fused: returns ``(white, recon',
    c_next)`` where ``c_next`` is the next scale's carry and ``recon' =
    recon + white``.  ``white`` is None when ``write_plane=False``.

    ``recon=None`` (requires ``write_plane=True``) skips the in-kernel
    reconstruction accumulation — no recon read/write rides the launch
    (134 MB/scale at 4k²) and ``recon'`` comes back None; the caller
    sums the whitened planes in XLA, which fuses all the adds into one
    pass.  Pass a recon array only when the planes are NOT materialized
    (serving mode), where in-kernel accumulation is what avoids the
    plane round trip.

    ``carry``/``recon``: ``(B, H, W)`` float32; ``threshold``: ``(B,)``
    per-frame significance threshold (used only when ``masked``).
    Numerically equivalent to the XLA step in models/wow.py
    ``_wow_body_fused`` (erf approximation aside when masked+soft).
    """
    accum = recon is not None
    assert accum or write_plane
    B, H, W = carry.shape
    D = 1 << scale
    hw = sf.half_width
    Rc = hw * D

    T2 = _ring_rows(H, W, D)
    if T2 and H % D == 0 and (H // D) >= 2 * hw:
        M = H // D
        DT = D // T2
        grid = (B, DT // 2, M, 2)

        def omap(b, p, k, cls):
            c = jnp.where(cls == 0, p, DT - 1 - p)
            return (b, c + k * DT, 0)

        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pl.ANY)]
        operands = [jnp.broadcast_to(
            threshold.astype(jnp.float32).reshape(-1), (B,)), carry]
        out_shapes = [jax.ShapeDtypeStruct((B, H, W), jnp.float32)]
        out_specs = [pl.BlockSpec((1, T2, W), omap)]
        if accum:
            in_specs.append(pl.BlockSpec((1, T2, W), omap))
            operands.append(recon)
            out_shapes.append(jax.ShapeDtypeStruct((B, H, W),
                                                   jnp.float32))
            out_specs.append(pl.BlockSpec((1, T2, W), omap))
        if write_plane:
            out_shapes.append(
                jax.ShapeDtypeStruct((B, H, W), jnp.float32))
            out_specs.append(pl.BlockSpec((1, T2, W), omap))

        RING = 4 * hw + 2
        kernel = _make_ring_kernel(sf.taps, T2, W, D, M, float(weight),
                                   soft, masked, write_plane, accum)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=tuple(out_shapes),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=[
                pltpu.VMEM((2, RING, T2, W), jnp.float32),
                pltpu.VMEM((T2, W + 2 * Rc), jnp.float32),
                pltpu.SemaphoreType.DMA((2, RING)),
            ],
            interpret=interpret,
        )(*operands)
    else:
        T = deep_block_rows(H, W, D)
        if T == 0:
            raise ValueError("deep_whiten_step: no feasible block (use "
                             "can_deep before dispatch)")
        NB = H // T
        DT = D // T
        nblk = 4 * hw + 1

        def refl(idx):
            idx = jnp.where(idx < 0, -idx - 1, idx)
            return jnp.where(idx >= NB, 2 * NB - 1 - idx, idx)

        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
        for m in range(-2 * hw, 2 * hw + 1):
            in_specs.append(pl.BlockSpec(
                (1, T, W), lambda b, i, m=m: (b, refl(i + m * DT), 0)))
        operands = [jnp.broadcast_to(
            threshold.astype(jnp.float32).reshape(-1), (B,)),
            *([carry] * nblk)]
        out_shapes = [jax.ShapeDtypeStruct((B, H, W), jnp.float32)]
        out_specs = [pl.BlockSpec((1, T, W), lambda b, i: (b, i, 0))]
        if accum:
            in_specs.append(
                pl.BlockSpec((1, T, W), lambda b, i: (b, i, 0)))
            operands.append(recon)
            out_shapes.append(jax.ShapeDtypeStruct((B, H, W),
                                                   jnp.float32))
            out_specs.append(
                pl.BlockSpec((1, T, W), lambda b, i: (b, i, 0)))
        if write_plane:
            out_shapes.append(jax.ShapeDtypeStruct((B, H, W),
                                                   jnp.float32))
            out_specs.append(
                pl.BlockSpec((1, T, W), lambda b, i: (b, i, 0)))

        kernel = _make_deep_kernel(sf.taps, T, W, D, NB, float(weight),
                                   soft, masked, write_plane, accum)
        outs = pl.pallas_call(
            kernel,
            grid=(B, NB),
            out_shape=tuple(out_shapes),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=[pltpu.VMEM((T, W + 2 * Rc), jnp.float32)],
            interpret=interpret,
        )(*operands)

    outs = list(outs)
    cnext = outs.pop(0)
    recon_out = outs.pop(0) if accum else None
    white = outs.pop(0) if write_plane else None
    return white, recon_out, cnext
