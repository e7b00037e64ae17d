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
(same tap fold order, same clamps; **bitwise on hardware**, verified
per round by scripts/tpu_check.py — pallas *interpret* mode rounds the
identical fold expressions with one extra FMA contraction, so CPU
interpret tests compare to ≤1 ulp); masked scales use the same
Abramowitz-Stegun erf as the fused whiten kernel (max err 1.5e-7).

v3 (stream, round 3; supersedes the round-2 mirror-paired ring kernel —
see git history): blocks ``i ≡ c (mod D/T)`` couple only with their own
residue class, and the symmetric extension of a class is *periodic* —
own blocks 0..M−1 followed by the mirror class's blocks in reverse
order with rows flipped.  Each class therefore streams independently:
a manual-DMA ring fetches every block once (extension blocks are
fetched directly and row-flipped once at landing), a lookahead leg
computes the chain smooth ONCE per block into a computed-smooth ring
(the v2 kernel recomputed it 5×, once per power-smooth offset), and
the power fold reads its five neighbors from that ring.  All mirrors
are exact XOR-butterfly roll reversals on the VPU — the v2 kernel's
anti-diagonal bf16×3 MXU matmuls ran at ~12% MXU efficiency on 16-row
operands and cost ~0.5 ms/scale at 4k².  Measured per-scale cost at 4k²
(planes mode): 1.39/1.29/1.33/1.59 ms (v2) → 0.54/0.43/0.72/1.29 ms
(v3) for s = 6..9."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .filters import ScalingFunction
from .pallas_conv import _exact_dot, _exact_dot_left, _flip_mats
from .pallas_wow import _erf_pos

__all__ = ["deep_whiten_step", "can_deep", "can_deep_halo",
           "deep_block_rows", "deep_whiten_step2", "can_deep2",
           "deep_bilateral_whiten_step", "can_deep_bilateral",
           "deep_whiten_plane", "can_deep_plane"]

#: VMEM ceiling for the per-step footprint in (T·W) f32 buffers: 9
#: double-buffered input windows + recon in + 3 double-buffered outputs
#: + live elementwise temps.  Calibrated on the v5e: (T·W) = 16·4096
#: compiles inside the full WOW program; 32·4096 fits standalone but
#: exceeds scoped VMEM (21 MB) when co-scheduled in the pipeline.
#: Mosaic scoped-VMEM ceiling override (cf. pallas_conv._VMEM_PARAMS)
_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 << 20)

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
    (non-bilateral) chain, f32 or bf16 (bf16 rides the v3 stream only:
    the DMA ring lands bf16 blocks — half the HBM traffic of the f32
    chain on a bandwidth-bound tail — and the folds run in f32), 2-D or
    frame-batched, lane-tileable width, single-reflection geometry, and
    a feasible kernel — the v3 stream (``hw·2^s ≥ 32``: narrower
    mirrors hang the Mosaic roll lowering, measured; s ≥ 4 for B3spline
    at any tileable H) or the BlockSpec nine-window fallback
    (``hw·2^s`` a whole number of lane chunks)."""
    if bilateral is not None or carry.dtype not in (jnp.float32,
                                                   jnp.bfloat16):
        return False
    if carry.ndim not in (2, 3):
        return False
    H, W = carry.shape[-2:]
    D = 1 << scale
    hw = sf.half_width
    Rc = hw * D
    if W % 128:
        return False
    if 2 * hw * D > H:  # block reflection must stay single-bounce
        return False
    isz = jnp.dtype(carry.dtype).itemsize
    if (Rc >= 32 and H % D == 0 and (H // D) >= 2 * hw
            and _stream_rows(H, W, D, isz) > 0):
        return True
    if carry.dtype != jnp.float32:
        return False  # the BlockSpec fallback kernel is f32-only
    return Rc % 128 == 0 and deep_block_rows(H, W, D) > 0


def can_deep_halo(H_interior: int, W: int, dtype, sf: ScalingFunction,
                  scale: int) -> bool:
    """Whether the halo-mode stream step applies to a pre-extended local
    row band with ``H_interior`` output rows (sharded deep tail): v3
    stream geometry on the interior extent, no reflection gates."""
    if dtype not in (jnp.float32, jnp.bfloat16):
        return False
    D = 1 << scale
    hw = sf.half_width
    if W % 128 or hw * D < 32:
        return False
    if H_interior % D or H_interior < D:
        return False
    return _stream_rows(H_interior, W, D,
                        jnp.dtype(dtype).itemsize) > 0


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


def _rev_lanes(v, n: int):
    """Exact lane (last-axis) reversal via an XOR butterfly of circular
    rolls — pure data movement on the VPU.  Replaces the anti-diagonal
    MXU matmul mirror (measured ~0.5 ms/scale of tiny 16-row matmuls at
    ~12% MXU efficiency in the v2 ring kernel)."""
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    s = n // 2
    while s >= 1:
        fwd = pltpu.roll(v, n - s, v.ndim - 1)   # out[i] = v[i + s]
        bwd = pltpu.roll(v, s, v.ndim - 1)       # out[i] = v[i - s]
        v = jnp.where((col & s) == 0, fwd, bwd)
        s //= 2
    return v


def _rev_sublanes(v, n: int):
    """Exact sublane (first-axis) reversal via the same XOR butterfly.

    Mosaic's ``tpu.dynamic_rotate`` only lowers 32-bit lanes, so
    non-f32 inputs (the bf16 carry ring) round-trip through f32 — a
    lossless widening, pure VPU converts."""
    dt = v.dtype
    if dt != jnp.float32:
        v = v.astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
    s = n // 2
    while s >= 1:
        fwd = pltpu.roll(v, n - s, 0)
        bwd = pltpu.roll(v, s, 0)
        v = jnp.where((row & s) == 0, fwd, bwd)
        s //= 2
    return v.astype(dt)


#: the stream's true footprint is ~30 T·W f32 buffers; T=32 at W=4096
#: is 15.7 MB — inside the 21 MB scoped-VMEM ceiling, and measured
#: faster than T=16 (halves the residue-class count, so the per-class
#: prologue latency and per-step sequencing amortize 2×)
_STREAM_BUDGET = 16 << 20


def _stream_rows(H: int, W: int, D: int, itemsize: int = 4) -> int:
    """v3 block height: divides the dilation and the image height, with
    a VMEM fit for the stream footprint (carry ring 4hw+2 blocks +
    cnext ring 2hw+1 + ext + revolving outputs + elementwise temps ≈ 30
    T·W f32 buffers; bf16 halves the ring/output share — ~21 f32-
    equivalent buffers).  0 = infeasible."""
    per_elem = 30 * 4 if itemsize == 4 else 21 * 4
    for T in (32, 16, 8):
        if D % T or H % T:
            continue
        if per_elem * T * W <= _STREAM_BUDGET:
            return T
    return 0


def _make_stream_kernel(taps, T: int, W: int, D: int, M: int,
                        weight: float, soft: bool, masked: bool,
                        write_plane: bool, accum: bool = True,
                        dt=jnp.float32, halo_blocks: int = 0):
    """v3 (stream): one residue class per grid slice, processed as a
    single sequential stream whose symmetric extension is materialized
    at fetch time.

    Key identities over v2's mirror-paired rings:

    * The reflected extension of class ``c`` is the mirror class
      ``D/T−1−c`` with blocks in reverse order and rows flipped, and it
      is **periodic** — so a class is self-contained: extension blocks
      are fetched directly from HBM (6 extra block reads per class) and
      row-flipped once at fetch time with the exact butterfly reversal.
      No per-step value flips, no pairing.
    * The chain smooth is computed ONCE per block (v2 recomputed it 5×,
      once per power-smooth offset): a lookahead leg computes
      ``c_next(t+hw)`` into a computed-smooth ring, and the power fold
      at block ``t`` reads its five neighbors from the ring.  Because
      reflection commutes with the symmetric tap folds, the smooth of
      the flipped extension equals the flip of the mirror's smooth
      bitwise — the extension needs no special-case arithmetic.

    Tap fold order, clamps, and masking are identical to
    :func:`_deep_compute` (bitwise vs the XLA deferred-tail step for
    f32).  ``dt`` is the storage dtype: bf16 carries land bf16 blocks
    in the DMA ring (half the HBM traffic — the tail is bandwidth-
    bound) and every fold runs in f32 with the chain carry, the white
    plane, and the recon accumulator rounding back to ``dt`` on store
    (the dtype-preserving contract, watroo/wavelets.py:297).

    ``halo_blocks > 0`` is **halo mode** (the sharded engine's deep
    tail): the carry arrives pre-extended by ``halo_blocks·T`` rows per
    side — neighbor-shard data (or materialized global reflection on
    the edge shards) supplied by the caller — so stream positions
    outside ``[0, M)`` read real rows at offset ``halo_blocks`` and the
    in-kernel row reflection is disabled.  Out-of-range prologue
    prefetches clamp to the array (their values are never consumed).
    Column reflection is unchanged (full-width rows)."""
    hw = (len(taps) - 1) // 2
    Rc = hw * D
    DT = D // T
    NC = 4 * hw + 2          # carry ring slots
    NN = 2 * hw + 1          # computed-smooth ring slots
    LAST = M + 2 * hw - 1    # last stream position fetched
    f32 = dt == jnp.float32
    NBLK = M * DT + 2 * halo_blocks  # carry blocks incl. the halo

    def kernel(*refs):
        thr_ref = refs[0]
        carry_hbm = refs[1]
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
        ring, cnr, ext, sems = refs[s0:s0 + 4]

        b = pl.program_id(0)
        c = pl.program_id(1)
        t = pl.program_id(2)

        def slot(p):
            return jax.lax.rem(
                jnp.asarray(p + 2 * hw, jnp.int32), jnp.int32(NC))

        def cslot(p):
            return jax.lax.rem(
                jnp.asarray(p + hw, jnp.int32), jnp.int32(NN))

        def pos_dma(p):
            # absolute row block of stream position p: own blocks for
            # 0 <= p < M, single-bounce reflected otherwise (flip
            # applied after landing).  Halo mode: positions index the
            # pre-extended carry at offset halo_blocks; out-of-range
            # prefetches clamp (never consumed).
            a = c + jnp.asarray(p, jnp.int32) * DT
            if halo_blocks:
                a = jnp.clip(a + halo_blocks, 0, NBLK - 1)
            else:
                a = jnp.where(a < 0, -a - 1, a)
                a = jnp.where(a >= M * DT, 2 * M * DT - 1 - a, a)
            sl = slot(p)
            r0 = pl.multiple_of(a * T, 8)
            return pltpu.make_async_copy(
                carry_hbm.at[b, pl.ds(r0, T), :],
                ring.at[sl], sems.at[sl])

        def flip_ext(p, is_ext):
            if halo_blocks:
                return  # pre-materialized extension, nothing reflected

            def do():
                sl = slot(p)
                ring[sl] = _rev_sublanes(ring[sl], T)

            if isinstance(is_ext, bool):
                if is_ext:
                    do()
            else:
                pl.when(is_ext)(do)

        def vblk(p):
            # f32 view of a carry ring block (bf16 blocks fold in f32)
            v = ring[slot(p)]
            return v if f32 else v.astype(jnp.float32)

        E0 = max(Rc, 128)

        def wpass(val):
            # dilated column pass with in-kernel symmetric mirror; the
            # edges are exact butterfly reversals (pure VPU movement).
            # val sits at lane-aligned offset E0; for Rc < 128 the
            # mirror is one aligned 128-wide reversal whose trailing
            # 128−Rc columns land outside the read range (reads start
            # at E0 − hw·D = 128 − Rc), so every ext store is aligned.
            ext[:, E0:E0 + W] = val
            if Rc >= 128:
                ext[:, 0:Rc] = _rev_lanes(val[:, 0:Rc], Rc)
                ext[:, E0 + W:E0 + W + Rc] = _rev_lanes(
                    val[:, W - Rc:W], Rc)
            else:
                ext[:, 0:128] = _rev_lanes(val[:, 0:128], 128)
                ext[:, E0 + W:E0 + W + 128] = _rev_lanes(
                    val[:, W - 128:W], 128)
            out = val * taps[hw]
            for j in range(1, hw + 1):
                left = ext[:, E0 - j * D:E0 - j * D + W]
                right = ext[:, E0 + j * D:E0 + j * D + W]
                out = out + taps[hw + j] * (left + right)
            return out

        def compute_cnext(p):
            # row fold order matches ops/conv.separable_smooth_axis
            h = vblk(p) * taps[hw]
            for j in range(1, hw + 1):
                h = h + taps[hw + j] * (vblk(p - j) + vblk(p + j))
            cnr[cslot(p)] = wpass(h)

        # ---- prologue: head extension + warm-up ----------------------
        @pl.when(t == 0)
        def _():
            for p in range(-2 * hw, 2 * hw + 2):
                pos_dma(p).start()
            for p in range(-2 * hw, 2 * hw + 1):
                pos_dma(p).wait()
                flip_ext(p, p < 0 or p >= M)
            for p in range(-hw, hw + 1):
                compute_cnext(p)

        # ---- steady state: fetch ahead + one lookahead smooth --------
        @pl.when(t > 0)
        def _():
            @pl.when(t <= M - 2)
            def _():
                pos_dma(t + 2 * hw + 1).start()

            pw = t + 2 * hw
            pos_dma(pw).wait()
            flip_ext(pw, pw >= M)
            compute_cnext(t + hw)

        # ---- whiten block t ------------------------------------------
        ca_c = vblk(t) - cnr[cslot(t)]
        tp = (ca_c * ca_c) * taps[hw]
        for j in range(1, hw + 1):
            ca_m = vblk(t - j) - cnr[cslot(t - j)]
            ca_p = vblk(t + j) - cnr[cslot(t + j)]
            tp = tp + taps[hw + j] * (ca_m * ca_m + ca_p * ca_p)
        lp = wpass(tp)
        lp = jnp.sqrt(jnp.where(lp <= 0, jnp.float32(1e-15), lp))

        wc = ca_c
        if masked:
            thr_b = thr_ref[b]
            safe_t = jnp.where(thr_b == 0, jnp.float32(1.0), thr_b)
            if soft:
                mask = _erf_pos(jnp.abs(wc) / safe_t)
            else:
                mask = (jnp.abs(wc) > safe_t).astype(jnp.float32)
            wc = wc * jnp.where(thr_b == 0, jnp.float32(1.0), mask)
        white = wc * (weight / lp)

        if accum:
            recon_out[0] = (recon_ref[0].astype(jnp.float32)
                            + white).astype(dt)
        cnext_ref[0] = cnr[cslot(t)].astype(dt)
        if write_plane:
            plane_ref[0] = white.astype(dt)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("sf", "scale", "weight", "soft", "masked",
                     "write_plane", "interpret", "halo"))
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
    halo: int = 0,
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

    ``halo > 0`` (sharded deep tail, parallel/sharded.py): the carry is
    a local row band pre-extended by ``halo == 2·hw·2^scale`` rows per
    side (neighbor halos / materialized global reflection); outputs
    cover only the ``H − 2·halo`` interior rows and the in-kernel row
    reflection is off.  Requires the v3 stream geometry on the interior
    extent.
    """
    accum = recon is not None
    assert accum or write_plane
    B, H, W = carry.shape
    if halo:
        assert halo == 2 * sf.half_width * (1 << scale), \
            "halo mode requires halo == 2*hw*2^scale"
        H = H - 2 * halo  # interior (output) rows
    D = 1 << scale
    hw = sf.half_width
    Rc = hw * D
    dt = carry.dtype

    T2 = _stream_rows(H, W, D, jnp.dtype(dt).itemsize)
    if T2 and Rc >= 32 and H % D == 0 and (halo or (H // D) >= 2 * hw):
        M = H // D
        DT = D // T2
        grid = (B, DT, M)

        def omap(b, c, t):
            return (b, c + t * DT, 0)

        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pl.ANY)]
        operands = [jnp.broadcast_to(
            threshold.astype(jnp.float32).reshape(-1), (B,)), carry]
        out_shapes = [jax.ShapeDtypeStruct((B, H, W), dt)]
        out_specs = [pl.BlockSpec((1, T2, W), omap)]
        if accum:
            in_specs.append(pl.BlockSpec((1, T2, W), omap))
            operands.append(recon)
            out_shapes.append(jax.ShapeDtypeStruct((B, H, W), dt))
            out_specs.append(pl.BlockSpec((1, T2, W), omap))
        if write_plane:
            out_shapes.append(jax.ShapeDtypeStruct((B, H, W), dt))
            out_specs.append(pl.BlockSpec((1, T2, W), omap))

        NC = 4 * hw + 2
        NN = 2 * hw + 1
        kernel = _make_stream_kernel(sf.taps, T2, W, D, M, float(weight),
                                     soft, masked, write_plane, accum,
                                     dt=dt, halo_blocks=halo // T2)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=tuple(out_shapes),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=[
                pltpu.VMEM((NC, T2, W), dt),
                pltpu.VMEM((NN, T2, W), jnp.float32),
                pltpu.VMEM((T2, W + 2 * max(Rc, 128)), jnp.float32),
                pltpu.SemaphoreType.DMA((NC,)),
            ],
            compiler_params=_VMEM_PARAMS,
            interpret=interpret,
        )(*operands)
    else:
        if halo:
            raise ValueError("deep_whiten_step: halo mode requires the "
                             "v3 stream geometry (gate with "
                             "can_deep_halo before dispatch)")
        T = deep_block_rows(H, W, D)
        if T == 0 or Rc % 128:
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
            compiler_params=_VMEM_PARAMS,
            interpret=interpret,
        )(*operands)

    outs = list(outs)
    cnext = outs.pop(0)
    recon_out = outs.pop(0) if accum else None
    white = outs.pop(0) if write_plane else None
    return white, recon_out, cnext


#: pair-stream footprint in T·W f32 buffers: carry ring (6hw+2) +
#: cnext1 ring (8hw+1) + cnext2 ring (4hw+1) + ext + revolving outputs
#: + elementwise temps ≈ 53 for hw=2.
_STREAM2_BUFS = 53
_STREAM2_BUDGET = 16 << 20


def _stream2_rows(H: int, W: int, D: int, itemsize: int = 4) -> int:
    """Pair-stream block height: divides the *base* dilation and the
    image height, VMEM fit for the doubled ring footprint (bf16 rings
    and outputs shave ~30% off the f32 footprint)."""
    per_elem = _STREAM2_BUFS * 4 if itemsize == 4 else 38 * 4
    for T in (32, 16, 8):
        if D % T or H % T:
            continue
        if per_elem * T * W <= _STREAM2_BUDGET:
            return T
    return 0


def can_deep2(carry: jax.Array, sf: ScalingFunction, scale: int,
              bilateral) -> bool:
    """Whether the fused two-scale deep step applies to scales
    ``(scale, scale+1)``: plain f32/bf16 chain, the base scale feasible
    for the v3 stream (``hw·2^s ≥ 32``), single-bounce row reflection
    for the pair's ±5hw stream positions (``M = H/D ≥ 5hw+1``) and
    single-bounce column reflection for the second scale's mirror
    (``W ≥ 2hw·2^(s+1)``)."""
    if bilateral is not None or carry.dtype not in (jnp.float32,
                                                   jnp.bfloat16):
        return False
    if carry.ndim not in (2, 3):
        return False
    H, W = carry.shape[-2:]
    D = 1 << scale
    hw = sf.half_width
    if W % 128 or hw * D < 32:
        return False
    if H % D or (H // D) < 5 * hw + 1:
        return False
    if W < 4 * hw * D:  # scale-2 column mirror, single bounce
        return False
    return _stream2_rows(H, W, D, jnp.dtype(carry.dtype).itemsize) > 0


def _make_stream2_kernel(taps, T: int, W: int, D: int, M: int,
                         weights, soft: bool, masked, write_plane: bool,
                         accum: bool = False, dt=jnp.float32):
    """Two consecutive deep scales fused into one stream launch.

    All row offsets of scale ``s`` (±j·D) *and* scale ``s+1`` (±j·2D)
    are multiples of ``D``, so both scales live inside the same residue
    class c (mod D in T-blocks) — the class stream of
    :func:`_make_stream_kernel` extends to carry a second computed-
    smooth ring and the intermediate carry never touches HBM:

    * ``cn1`` ring (8hw+1): chain smooth of scale s, computed once at
      lookahead ``t+4hw`` (scale s+1's own lookahead chain consumes
      positions up to ``t+4hw``).
    * ``cn2`` ring (4hw+1): chain smooth of scale s+1 over ``cn1`` at
      even offsets, computed at lookahead ``t+2hw``.
    * whiten both scales at stream position ``t``; the carry output is
      ``cn2(t)`` — one read + one carry write + the plane writes where
      two launches paid two reads + two carry writes.

    Traffic per scale pair (planes mode): ~(1+ε) read + 3 writes vs 6
    moves for two single launches.  The prologue fetches positions
    ``−5hw..hw+1`` as a batch, then rolls one fetch per computed
    ``cn1`` (the fetched slot is the one the just-consumed position
    freed), so the pair needs ``M ≥ 5hw+1`` for single-bounce
    reflection.  Fold order, clamps, masking identical to two chained
    :func:`_make_stream_kernel` launches (bitwise on hardware)."""
    hw = (len(taps) - 1) // 2
    Rc = hw * D
    Rc2 = 2 * Rc
    DT = D // T
    NC = 6 * hw + 2
    N1 = 8 * hw + 1
    N2 = 4 * hw + 1
    E0 = max(Rc2, 128)
    w1, w2 = weights
    m1, m2 = masked
    f32 = dt == jnp.float32

    def kernel(*refs):
        thr_ref = refs[0]
        carry_hbm = refs[1]
        refs = refs[2:]
        if accum:
            recon_ref = refs[0]
            refs = refs[1:]
        cnext_ref = refs[0]
        refs = refs[1:]
        if accum:
            recon_out = refs[0]
            refs = refs[1:]
        if write_plane:
            plane1_ref, plane2_ref = refs[:2]
            refs = refs[2:]
        ring, cn1, cn2, ext, sems = refs

        b = pl.program_id(0)
        c = pl.program_id(1)
        t = pl.program_id(2)

        def slot(p):
            return jax.lax.rem(
                jnp.asarray(p + 5 * hw, jnp.int32), jnp.int32(NC))

        def s1(q):
            return jax.lax.rem(
                jnp.asarray(q + 4 * hw, jnp.int32), jnp.int32(N1))

        def s2(q):
            return jax.lax.rem(
                jnp.asarray(q + 2 * hw, jnp.int32), jnp.int32(N2))

        def pos_dma(p):
            a = c + jnp.asarray(p, jnp.int32) * DT
            a = jnp.where(a < 0, -a - 1, a)
            a = jnp.where(a >= M * DT, 2 * M * DT - 1 - a, a)
            sl = slot(p)
            r0 = pl.multiple_of(a * T, 8)
            return pltpu.make_async_copy(
                carry_hbm.at[b, pl.ds(r0, T), :],
                ring.at[sl], sems.at[sl])

        def flip_ext(p, is_ext):
            def do():
                sl = slot(p)
                ring[sl] = _rev_sublanes(ring[sl], T)

            if isinstance(is_ext, bool):
                if is_ext:
                    do()
            else:
                pl.when(is_ext)(do)

        def vblk(p):
            v = ring[slot(p)]
            return v if f32 else v.astype(jnp.float32)

        def wpass(val, dil):
            # dilated column pass with in-kernel symmetric mirror; the
            # shared ext buffer is sized for the wider scale (E0)
            Rk = hw * dil
            Rm = max(Rk, 128)
            ext[:, E0:E0 + W] = val
            ext[:, E0 - Rm:E0] = _rev_lanes(val[:, 0:Rm], Rm)
            ext[:, E0 + W:E0 + W + Rm] = _rev_lanes(
                val[:, W - Rm:W], Rm)
            out = val * taps[hw]
            for j in range(1, hw + 1):
                left = ext[:, E0 - j * dil:E0 - j * dil + W]
                right = ext[:, E0 + j * dil:E0 + j * dil + W]
                out = out + taps[hw + j] * (left + right)
            return out

        def compute_cn1(q):
            h = vblk(q) * taps[hw]
            for j in range(1, hw + 1):
                h = h + taps[hw + j] * (vblk(q - j) + vblk(q + j))
            cn1[s1(q)] = wpass(h, D)

        def compute_cn2(q):
            h = cn1[s1(q)] * taps[hw]
            for j in range(1, hw + 1):
                h = h + taps[hw + j] * (cn1[s1(q - 2 * j)]
                                        + cn1[s1(q + 2 * j)])
            cn2[s2(q)] = wpass(h, 2 * D)

        # ---- prologue: batch fetch + rolling compute ------------------
        @pl.when(t == 0)
        def _():
            for p in range(-5 * hw, hw + 2):
                pos_dma(p).start()
            for p in range(-5 * hw, -3 * hw):
                pos_dma(p).wait()
                flip_ext(p, p < 0 or p >= M)
            for q in range(-4 * hw, 4 * hw + 1):
                if q > 0:
                    # depth-1 prefetch; evicts position q-5hw-1, behind
                    # both the cn1 window (q-hw) and whiten(0)'s -hw
                    pos_dma(q + hw + 1).start()
                p = q + hw
                pos_dma(p).wait()
                flip_ext(p, p < 0 or p >= M)
                compute_cn1(q)
                if q >= 0:
                    compute_cn2(q - 2 * hw)

        # ---- steady state ---------------------------------------------
        @pl.when(t > 0)
        def _():
            # prologue fetched through 5hw+1; evicting t-hw-1 is safe
            # (whiten(t) reads down to t-hw)
            @pl.when(t <= M - 2)
            def _():
                pos_dma(t + 5 * hw + 1).start()

            pw = t + 5 * hw
            pos_dma(pw).wait()
            flip_ext(pw, pw >= M)
            compute_cn1(t + 4 * hw)
            compute_cn2(t + 2 * hw)

        # ---- whiten scale s at t ---------------------------------------
        d1c = vblk(t) - cn1[s1(t)]
        tp = (d1c * d1c) * taps[hw]
        for j in range(1, hw + 1):
            dm = vblk(t - j) - cn1[s1(t - j)]
            dp = vblk(t + j) - cn1[s1(t + j)]
            tp = tp + taps[hw + j] * (dm * dm + dp * dp)
        lp = wpass(tp, D)
        lp = jnp.sqrt(jnp.where(lp <= 0, jnp.float32(1e-15), lp))
        wc = d1c
        if m1:
            thr_b = thr_ref[0, b]
            safe_t = jnp.where(thr_b == 0, jnp.float32(1.0), thr_b)
            if soft:
                mask = _erf_pos(jnp.abs(wc) / safe_t)
            else:
                mask = (jnp.abs(wc) > safe_t).astype(jnp.float32)
            wc = wc * jnp.where(thr_b == 0, jnp.float32(1.0), mask)
        white1 = wc * (w1 / lp)

        # ---- whiten scale s+1 at t -------------------------------------
        d2c = cn1[s1(t)] - cn2[s2(t)]
        tp = (d2c * d2c) * taps[hw]
        for j in range(1, hw + 1):
            dm = cn1[s1(t - 2 * j)] - cn2[s2(t - 2 * j)]
            dp = cn1[s1(t + 2 * j)] - cn2[s2(t + 2 * j)]
            tp = tp + taps[hw + j] * (dm * dm + dp * dp)
        lp = wpass(tp, 2 * D)
        lp = jnp.sqrt(jnp.where(lp <= 0, jnp.float32(1e-15), lp))
        wc = d2c
        if m2:
            thr_b = thr_ref[1, b]
            safe_t = jnp.where(thr_b == 0, jnp.float32(1.0), thr_b)
            if soft:
                mask = _erf_pos(jnp.abs(wc) / safe_t)
            else:
                mask = (jnp.abs(wc) > safe_t).astype(jnp.float32)
            wc = wc * jnp.where(thr_b == 0, jnp.float32(1.0), mask)
        white2 = wc * (w2 / lp)

        cnext_ref[0] = cn2[s2(t)].astype(dt)
        if accum:
            recon_out[0] = (recon_ref[0].astype(jnp.float32)
                            + (white1 + white2)).astype(dt)
        if write_plane:
            plane1_ref[0] = white1.astype(dt)
            plane2_ref[0] = white2.astype(dt)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("sf", "scale", "weights", "soft", "masked",
                     "write_plane", "interpret"))
def deep_whiten_step2(
    carry: jax.Array,
    recon,
    thresholds: jax.Array,
    *,
    sf: ScalingFunction,
    scale: int,
    weights,
    soft: bool = True,
    masked=(False, False),
    write_plane: bool = True,
    interpret: bool = False,
):
    """Two consecutive deferred-tail WOW scales ``(scale, scale+1)``
    fused in one launch: returns ``(white_s, white_s1, recon',
    c_next2)`` — the intermediate carry (scale s's smooth) lives only
    in the VMEM ring, halving the deep tail's HBM traffic per pair.
    ``thresholds``: ``(2, B)`` per-scale/per-frame significance
    thresholds; ``weights``/``masked``: static pairs.  ``recon=None``
    skips in-kernel reconstruction accumulation (the caller's XLA sum
    fuses the adds); whites are None when ``write_plane=False``.
    Numerically identical to two chained :func:`deep_whiten_step`
    launches (same folds, same clamps; reference loop
    watroo/utils.py:174-203)."""
    accum = recon is not None
    assert accum or write_plane
    B, H, W = carry.shape
    D = 1 << scale
    hw = sf.half_width
    dt = carry.dtype
    T = _stream2_rows(H, W, D, jnp.dtype(dt).itemsize)
    if T == 0:
        raise ValueError("deep_whiten_step2: infeasible geometry (use "
                         "can_deep2 before dispatch)")
    M = H // D
    DT = D // T
    grid = (B, DT, M)

    def omap(b, c, t):
        return (b, c + t * DT, 0)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY)]
    operands = [jnp.broadcast_to(
        thresholds.astype(jnp.float32).reshape(2, -1), (2, B)), carry]
    if accum:
        in_specs.append(pl.BlockSpec((1, T, W), omap))
        operands.append(recon)
    out_shapes = [jax.ShapeDtypeStruct((B, H, W), dt)]
    out_specs = [pl.BlockSpec((1, T, W), omap)]
    if accum:
        out_shapes.append(jax.ShapeDtypeStruct((B, H, W), dt))
        out_specs.append(pl.BlockSpec((1, T, W), omap))
    if write_plane:
        out_shapes += [jax.ShapeDtypeStruct((B, H, W), dt)] * 2
        out_specs += [pl.BlockSpec((1, T, W), omap)] * 2

    NC = 6 * hw + 2
    N1 = 8 * hw + 1
    N2 = 4 * hw + 1
    Rc2 = 2 * hw * D
    E0 = max(Rc2, 128)
    kernel = _make_stream2_kernel(
        sf.taps, T, W, D, M,
        (float(weights[0]), float(weights[1])), soft,
        (bool(masked[0]), bool(masked[1])), write_plane, accum, dt=dt)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=tuple(out_shapes),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((NC, T, W), dt),
            pltpu.VMEM((N1, T, W), jnp.float32),
            pltpu.VMEM((N2, T, W), jnp.float32),
            pltpu.VMEM((T, W + 2 * E0), jnp.float32),
            pltpu.SemaphoreType.DMA((NC,)),
        ],
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(*operands)
    outs = list(outs)
    cnext = outs.pop(0)
    recon_out = outs.pop(0) if accum else None
    white1 = outs.pop(0) if write_plane else None
    white2 = outs.pop(0) if write_plane else None
    return white1, white2, recon_out, cnext


def _plane_rows(H: int, W: int, D: int) -> int:
    """Power-only block height (footprint ≈ 16 T·W f32 buffers: 2hw+2
    ring slots + ext + output windows + temps).  0 = infeasible."""
    for T in (32, 16, 8):
        if D % T or H % T:
            continue
        if 16 * T * W * 4 <= _VMEM_BUDGET:
            return T
    return 0


def can_deep_plane(plane: jax.Array, sf: ScalingFunction,
                   scale: int) -> bool:
    """Whether :func:`deep_whiten_plane` applies: the v3 stream
    geometry gates minus the chain (the detail plane is given, only the
    power smooth runs — the ``wow(Coefficients)`` reuse entry's deep
    scales, watroo/utils.py:128-133 with :193-199)."""
    if plane.dtype != jnp.float32 or plane.ndim not in (2, 3):
        return False
    H, W = plane.shape[-2:]
    D = 1 << scale
    hw = sf.half_width
    Rc = hw * D
    if W % 128 or Rc < 32 or Rc > W:
        return False
    if 2 * hw * D > H or H % D or (H // D) < hw:
        return False
    return _plane_rows(H, W, D) > 0


def _make_plane_kernel(taps, T: int, W: int, D: int, M: int,
                       weight: float, soft: bool, masked: bool):
    """Power-only stream: whiten a *given* deep detail plane
    ``c·sig(c)·w / sqrt(max(smooth_s(c²), 1e-15))`` without the chain
    smooth — a 2hw+2-slot ring streams each residue class once (same
    periodic-extension identity as :func:`_make_stream_kernel`), the
    squared row fold reads its 2hw+1 neighbors from the ring, and the
    dilated column pass mirrors in ``ext``.  Fold order matches the XLA
    ``smooth(c², scale)`` (reflection commutes with squaring, so the
    flipped extension squares to the flipped square)."""
    hw = (len(taps) - 1) // 2
    Rc = hw * D
    DT = D // T
    NC = 2 * hw + 2

    def kernel(thr_ref, x_hbm, white_ref, ring, ext, sems):
        b = pl.program_id(0)
        c = pl.program_id(1)
        t = pl.program_id(2)

        def slot(p):
            return jax.lax.rem(
                jnp.asarray(p + hw, jnp.int32), jnp.int32(NC))

        def pos_dma(p):
            a = c + jnp.asarray(p, jnp.int32) * DT
            a = jnp.where(a < 0, -a - 1, a)
            a = jnp.where(a >= M * DT, 2 * M * DT - 1 - a, a)
            sl = slot(p)
            r0 = pl.multiple_of(a * T, 8)
            return pltpu.make_async_copy(
                x_hbm.at[b, pl.ds(r0, T), :],
                ring.at[sl], sems.at[sl])

        def flip_ext(p, is_ext):
            def do():
                sl = slot(p)
                ring[sl] = _rev_sublanes(ring[sl], T)

            if isinstance(is_ext, bool):
                if is_ext:
                    do()
            else:
                pl.when(is_ext)(do)

        def vblk(p):
            return ring[slot(p)]

        E0 = max(Rc, 128)

        def wpass(val):
            ext[:, E0:E0 + W] = val
            if Rc >= 128:
                ext[:, 0:Rc] = _rev_lanes(val[:, 0:Rc], Rc)
                ext[:, E0 + W:E0 + W + Rc] = _rev_lanes(
                    val[:, W - Rc:W], Rc)
            else:
                ext[:, 0:128] = _rev_lanes(val[:, 0:128], 128)
                ext[:, E0 + W:E0 + W + 128] = _rev_lanes(
                    val[:, W - 128:W], 128)
            out = val * taps[hw]
            for j in range(1, hw + 1):
                left = ext[:, E0 - j * D:E0 - j * D + W]
                right = ext[:, E0 + j * D:E0 + j * D + W]
                out = out + taps[hw + j] * (left + right)
            return out

        @pl.when(t == 0)
        def _():
            for p in range(-hw, hw + 2):
                pos_dma(p).start()
            for p in range(-hw, hw + 1):
                pos_dma(p).wait()
                flip_ext(p, p < 0 or p >= M)

        @pl.when(t > 0)
        def _():
            @pl.when(t <= M - 2)
            def _():
                pos_dma(t + hw + 1).start()

            pw = t + hw
            pos_dma(pw).wait()
            flip_ext(pw, pw >= M)

        cb = vblk(t)
        tp = (cb * cb) * taps[hw]
        for j in range(1, hw + 1):
            cm = vblk(t - j)
            cp = vblk(t + j)
            tp = tp + taps[hw + j] * (cm * cm + cp * cp)
        lp = wpass(tp)
        lp = jnp.sqrt(jnp.where(lp <= 0, jnp.float32(1e-15), lp))

        wc = cb
        if masked:
            thr_b = thr_ref[b]
            safe_t = jnp.where(thr_b == 0, jnp.float32(1.0), thr_b)
            if soft:
                mask = _erf_pos(jnp.abs(wc) / safe_t)
            else:
                mask = (jnp.abs(wc) > safe_t).astype(jnp.float32)
            wc = wc * jnp.where(thr_b == 0, jnp.float32(1.0), mask)
        white_ref[0] = wc * (weight / lp)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("sf", "scale", "weight", "soft", "masked",
                     "interpret"))
def deep_whiten_plane(
    plane: jax.Array,
    threshold: jax.Array,
    *,
    sf: ScalingFunction,
    scale: int,
    weight: float,
    soft: bool = True,
    masked: bool = False,
    interpret: bool = False,
):
    """Whiten one *materialized* deep detail plane: returns ``white =
    plane·sig·(weight / sqrt(max(smooth_s(plane²), 1e-15)))``.  The
    coefficients-reuse entry (``wow(Coefficients)``) and any other
    consumer holding the plane cube use this instead of the XLA power
    smooth (~2.2 ms/scale at 4k² → one streaming launch).

    ``plane``: ``(B, H, W)`` float32; ``threshold``: ``(B,)``.  Gate
    with :func:`can_deep_plane`."""
    B, H, W = plane.shape
    D = 1 << scale
    hw = sf.half_width
    Rc = hw * D
    T = _plane_rows(H, W, D)
    if T == 0 or H % D:
        raise ValueError("deep_whiten_plane: no feasible block (use "
                         "can_deep_plane before dispatch)")
    M = H // D
    DT = D // T
    NC = 2 * hw + 2

    def omap(b, c, t):
        return (b, c + t * DT, 0)

    kernel = _make_plane_kernel(sf.taps, T, W, D, M, float(weight),
                                soft, masked)
    return pl.pallas_call(
        kernel,
        grid=(B, DT, M),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, T, W), omap),
        scratch_shapes=[
            pltpu.VMEM((NC, T, W), jnp.float32),
            pltpu.VMEM((T, W + 2 * max(Rc, 128)), jnp.float32),
            pltpu.SemaphoreType.DMA((NC,)),
        ],
        interpret=interpret,
    )(jnp.broadcast_to(threshold.astype(jnp.float32).reshape(-1), (B,)),
      plane)


# ---------------------------------------------------------------------
# Bilateral deep-scale step (round 3)
# ---------------------------------------------------------------------

#: bilateral stream scratch: carry ring (4hw+2) + cnext ring (2hw+1)
#: + acc/nrm/inv2v spills = 18 T·W f32 buffers + the ext row + the tap
#: loop's live (T, W) value temps ≈ 26 T·W.  T=32 at 4k width measures
#: 17.0 MB of scoped vmem — over this platform's 16 MB kernel limit
#: (three fit attempts: full-width DAG 16.5 M, column-stripped 16.5 M,
#: fori_loop prologue + mean/m2 spill 17.0 M), so the budget pins T=16
#: at 4k / T=8 at 8k.
_BILATERAL_STREAM_BUDGET = 12 << 20


def _bilateral_stream_rows(H: int, W: int, D: int) -> int:
    for T in (32, 16, 8):
        if D % T or H % T:
            continue
        if 26 * T * W * 4 <= _BILATERAL_STREAM_BUDGET:
            return T
    return 0


def can_deep_bilateral(carry: jax.Array, sf: ScalingFunction,
                       scale: int) -> bool:
    """Whether the fused bilateral deep-whiten step applies: f32, 2-D
    or frame-batched, lane-tileable width, single-bounce reflection,
    and a feasible stream geometry (same gates as the plain v3 stream,
    :func:`can_deep`, minus the BlockSpec fallback)."""
    if carry.dtype != jnp.float32 or carry.ndim not in (2, 3):
        return False
    H, W = carry.shape[-2:]
    D = 1 << scale
    hw = sf.half_width
    Rc = hw * D
    if W % 128 or Rc < 32:
        return False
    if 2 * hw * D > H or H % D or (H // D) < 2 * hw:
        return False
    return _bilateral_stream_rows(H, W, D) > 0


def _make_bilateral_stream_kernel(taps, T: int, W: int, D: int, M: int,
                                  var_factor: float, weight: float,
                                  soft: bool, masked: bool):
    """Bilateral variant of :func:`_make_stream_kernel`: the chain
    smooth is the reference's bilateral à trous conv
    (watroo/wavelets.py:74-105 via ops/conv.atrous_conv_nd) — local
    variance under the scale window (× the static σ_b² factor), then
    the k²−1 range-weighted tap accumulation with normalizer — followed
    by the plain power smooth, significance, and whitening.  Same
    periodic-extension stream as the plain kernel (reflection commutes
    with the bilateral window function because the 2-D tap kernel is
    flip-symmetric), same ring geometry.  Numerics match the XLA
    deferred-tail step to tolerance (the tap iteration follows
    ops/conv._noncenter_offsets order, but the per-``m`` partial sums
    regroup the additions, and Mosaic's exp differs in ulps — parity
    ~1e-6 on unit-scale data, not bitwise)."""
    hw = (len(taps) - 1) // 2
    Rc = hw * D
    DT = D // T
    NC = 4 * hw + 2
    NN = 2 * hw + 1
    center = taps[hw] ** 2
    inv_vf = 0.5 / var_factor
    tap_k = {(m, j): taps[hw + m] * taps[hw + j]
             for m in range(-hw, hw + 1) for j in range(-hw, hw + 1)}
    # the reference's tap order (descending meshgrid,
    # watroo/wavelets.py:89-91 / ops/conv._noncenter_offsets)
    row_offs = list(range(hw, -hw - 1, -1))
    col_offs = list(range(hw, -hw - 1, -1))

    def kernel(thr_ref, carry_hbm, cnext_ref, white_ref, ring, cnr,
               ext, acc_ref, nrm_ref, inv2v_ref, sems):
        b = pl.program_id(0)
        c = pl.program_id(1)
        t = pl.program_id(2)

        def slot(p):
            return jax.lax.rem(
                jnp.asarray(p + 2 * hw, jnp.int32), jnp.int32(NC))

        def cslot(p):
            return jax.lax.rem(
                jnp.asarray(p + hw, jnp.int32), jnp.int32(NN))

        def pos_dma(p):
            a = c + jnp.asarray(p, jnp.int32) * DT
            a = jnp.where(a < 0, -a - 1, a)
            a = jnp.where(a >= M * DT, 2 * M * DT - 1 - a, a)
            sl = slot(p)
            r0 = pl.multiple_of(a * T, 8)
            return pltpu.make_async_copy(
                carry_hbm.at[b, pl.ds(r0, T), :],
                ring.at[sl], sems.at[sl])

        def flip_ext(p, is_ext):
            def do():
                sl = slot(p)
                ring[sl] = _rev_sublanes(ring[sl], T)

            if isinstance(is_ext, bool):
                if is_ext:
                    do()
            else:
                pl.when(is_ext)(do)

        def vblk(p):
            return ring[slot(p)]

        E0 = max(Rc, 128)

        def fill_ext(val):
            # symmetric column extension: same mirror fill as the plain
            # stream's wpass (exact butterfly reversals)
            ext[:, E0:E0 + W] = val
            if Rc >= 128:
                ext[:, 0:Rc] = _rev_lanes(val[:, 0:Rc], Rc)
                ext[:, E0 + W:E0 + W + Rc] = _rev_lanes(
                    val[:, W - Rc:W], Rc)
            else:
                ext[:, 0:128] = _rev_lanes(val[:, 0:128], 128)
                ext[:, E0 + W:E0 + W + 128] = _rev_lanes(
                    val[:, W - 128:W], 128)

        def wpass(val):
            fill_ext(val)
            out = val * taps[hw]
            for j in range(1, hw + 1):
                left = ext[:, E0 - j * D:E0 - j * D + W]
                right = ext[:, E0 + j * D:E0 + j * D + W]
                out = out + taps[hw + j] * (left + right)
            return out

        def compute_cnext(p):
            # local variance under the scale window: two separable
            # smooths (fold order = ops/conv.smooth: rows then columns).
            # acc/nrm double as the mean/m2 spill slots here (free until
            # the tap loop) to keep the Mosaic value stack bounded.
            h = vblk(p) * taps[hw]
            for j in range(1, hw + 1):
                h = h + taps[hw + j] * (vblk(p - j) + vblk(p + j))
            acc_ref[...] = wpass(h)
            vq = vblk(p)
            hq = (vq * vq) * taps[hw]
            for j in range(1, hw + 1):
                vm = vblk(p - j)
                vp = vblk(p + j)
                hq = hq + taps[hw + j] * (vm * vm + vp * vp)
            nrm_ref[...] = wpass(hq)
            mean = acc_ref[...]
            vari = nrm_ref[...] - mean * mean
            vari = jnp.where(vari <= 0, jnp.float32(1e-20), vari)
            # inv_two_var = 0.5 / (vari · σ_b²·scale_factor)
            inv2v_ref[...] = jnp.float32(inv_vf) / vari
            ci0 = vblk(p)
            acc_ref[...] = ci0 * jnp.float32(center)
            nrm_ref[...] = jnp.full((T, W), jnp.float32(center))
            # column strips bound the tap loop's live value temps
            # (Mosaic stacks ~7 of them; full-width at T=32 blows the
            # 16 MB scoped-vmem limit by ~0.5 MB)
            CS = W // 2 if W % 2 == 0 and W >= 2048 else W
            for m in row_offs:
                fill_ext(vblk(p + m))
                for c0 in range(0, W, CS):
                    ci = vblk(p)[:, c0:c0 + CS]
                    iv = inv2v_ref[:, c0:c0 + CS]
                    pa = None
                    pn = None
                    for j in col_offs:
                        if m == 0 and j == 0:
                            continue
                        sh = ext[:, E0 + j * D + c0:
                                 E0 + j * D + c0 + CS]
                        diff = ci - sh
                        w = jnp.float32(tap_k[(m, j)]) * jnp.exp(
                            -(diff * diff) * iv)
                        pn = w if pn is None else pn + w
                        pa = w * sh if pa is None else pa + w * sh
                    acc_ref[:, c0:c0 + CS] = (acc_ref[:, c0:c0 + CS]
                                              + pa)
                    nrm_ref[:, c0:c0 + CS] = (nrm_ref[:, c0:c0 + CS]
                                              + pn)
            cnr[cslot(p)] = acc_ref[...] / nrm_ref[...]

        # ---- prologue: head extension + warm-up ----------------------
        @pl.when(t == 0)
        def _():
            for p in range(-2 * hw, 2 * hw + 2):
                pos_dma(p).start()
            for p in range(-2 * hw, 2 * hw + 1):
                pos_dma(p).wait()
                flip_ext(p, p < 0 or p >= M)
            # fori_loop (not unrolled): the bilateral chain smooth's
            # value temps would otherwise stack 2hw+1 deep and blow the
            # 16 MB scoped-vmem limit at T=32
            jax.lax.fori_loop(
                -hw, hw + 1,
                lambda p, _: (compute_cnext(p), 0)[1], 0)

        # ---- steady state: fetch ahead + one lookahead smooth --------
        @pl.when(t > 0)
        def _():
            @pl.when(t <= M - 2)
            def _():
                pos_dma(t + 2 * hw + 1).start()

            pw = t + 2 * hw
            pos_dma(pw).wait()
            flip_ext(pw, pw >= M)
            compute_cnext(t + hw)

        # ---- whiten block t (identical to the plain stream) ----------
        ca_c = vblk(t) - cnr[cslot(t)]
        tp = (ca_c * ca_c) * taps[hw]
        for j in range(1, hw + 1):
            ca_m = vblk(t - j) - cnr[cslot(t - j)]
            ca_p = vblk(t + j) - cnr[cslot(t + j)]
            tp = tp + taps[hw + j] * (ca_m * ca_m + ca_p * ca_p)
        lp = wpass(tp)
        lp = jnp.sqrt(jnp.where(lp <= 0, jnp.float32(1e-15), lp))

        wc = ca_c
        if masked:
            thr_b = thr_ref[b]
            safe_t = jnp.where(thr_b == 0, jnp.float32(1.0), thr_b)
            if soft:
                mask = _erf_pos(jnp.abs(wc) / safe_t)
            else:
                mask = (jnp.abs(wc) > safe_t).astype(jnp.float32)
            wc = wc * jnp.where(thr_b == 0, jnp.float32(1.0), mask)
        white_ref[0] = wc * (weight / lp)
        cnext_ref[0] = cnr[cslot(t)]

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("sf", "scale", "var_factor", "weight", "soft",
                     "masked", "interpret"))
def deep_bilateral_whiten_step(
    carry: jax.Array,
    threshold: jax.Array,
    *,
    sf: ScalingFunction,
    scale: int,
    var_factor: float,
    weight: float,
    soft: bool = True,
    masked: bool = False,
    interpret: bool = False,
):
    """One deferred-tail *bilateral* WOW scale, fused: returns
    ``(white, c_next)``.  Replaces the XLA bilateral chain
    (ops/conv.atrous_conv_nd + local_variance + power smooth, the
    reference hot loop watroo/wavelets.py:84-105 at deep dilations) —
    the k² overlapping shifted reads and the two sdev smooths all run
    from the VMEM-resident carry ring.  ``var_factor`` is the static
    range-variance factor σ_b[s]²·(s+1 if bilateral_scaling).

    ``carry``: ``(B, H, W)`` float32; ``threshold``: ``(B,)``.  Gate
    with :func:`can_deep_bilateral`."""
    B, H, W = carry.shape
    D = 1 << scale
    hw = sf.half_width
    Rc = hw * D
    T = _bilateral_stream_rows(H, W, D)
    if T == 0 or H % D:
        raise ValueError("deep_bilateral_whiten_step: no feasible "
                         "block (use can_deep_bilateral)")
    M = H // D
    DT = D // T
    NC = 4 * hw + 2
    NN = 2 * hw + 1

    def omap(b, c, t):
        return (b, c + t * DT, 0)

    kernel = _make_bilateral_stream_kernel(
        sf.taps, T, W, D, M, float(var_factor), float(weight), soft,
        masked)
    cnext, white = pl.pallas_call(
        kernel,
        grid=(B, DT, M),
        out_shape=(jax.ShapeDtypeStruct((B, H, W), jnp.float32),
                   jax.ShapeDtypeStruct((B, H, W), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec((1, T, W), omap),
                   pl.BlockSpec((1, T, W), omap)),
        scratch_shapes=[
            pltpu.VMEM((NC, T, W), jnp.float32),
            pltpu.VMEM((NN, T, W), jnp.float32),
            pltpu.VMEM((T, W + 2 * max(Rc, 128)), jnp.float32),
            pltpu.VMEM((T, W), jnp.float32),
            pltpu.VMEM((T, W), jnp.float32),
            pltpu.VMEM((T, W), jnp.float32),
            pltpu.SemaphoreType.DMA((NC,)),
        ],
        interpret=interpret,
    )(jnp.broadcast_to(threshold.astype(jnp.float32).reshape(-1), (B,)),
      carry)
    return white, cnext
