"""Pallas TPU kernel: fused WOW whitening stage.

After decomposition, WOW whitens each detail plane by its local power:
``c ← c · sig(c) · w / sqrt(max(smooth_s(c²), 1e-15))``
(watroo/utils.py:174-203).  The XLA path spends one full dilated-smooth
round trip per scale on ``smooth_s(c²)`` plus several elementwise
passes.  This kernel processes each tile once per scale: it DMAs the
detail tile + a *per-scale* halo ``hw·2^s``, squares, smooths
(per-scale dilation), applies the significance mask and whitening
factor, writes the whitened plane through a BlockSpec revolving window,
and accumulates the partial reconstruction — one extra output pass
instead of L.

v2 design (measured on the axon v5e — see DESIGN.md):

* **No pre-padded plane cube.**  v1 ``jnp.pad``-ed the whole cube
  (≈ 2 extra image moves per plane).  v2 reads *clamped* windows from
  the unpadded planes (nine static DMA variants for interior/edge
  tiles) and reconstructs the symmetric border in-kernel with the exact
  anti-diagonal-matmul mirror from pallas_conv.  Borders are exact
  because reflection commutes with squaring and the power smooth does
  not chain across scales.
* **Pieces input.**  The decompose kernels emit per-group plane cubes;
  whiten reads scale ``s``'s window straight from its group cube
  (``layout``), so no (level+1)-plane concatenation ever materializes
  on the serving path.
* **BlockSpec outputs** (whitened planes + partial recon) ride
  Mosaic-managed revolving windows: per-step scalar cost is sub-µs
  (measured), and the plane writes stream at the platform's write
  bandwidth.  ``write_planes=False`` drops the plane outputs entirely
  for recon-only serving (writes are the platform bottleneck:
  ~400-480 GB/s vs ~940 GB/s reads).
* Leading **batch** grid dimension for frame stacks.

Significance: ``erf(|w|/t)`` with per-scale scalar threshold ``t``
from SMEM; ``t == 0`` disables masking (parity with
watroo/wavelets.py:129-143 for the known-noise case).  Mosaic has no
erf lowering, so erf is Abramowitz & Stegun 7.1.26 (max abs error
1.5e-7, below f32 visibility for a mask)."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .filters import ScalingFunction
from .pallas_conv import (
    _conv_pass_ref,
    _erf_pos,
    _exact_dot,
    _exact_dot_left,
    _flip_mats,
)

__all__ = ["fused_whiten_pieces", "whiten_max_scale"]

#: column halo (lane-dim window offsets must stay 128-aligned)
R_COL = 128

#: input DMA slots (prefetch depth for the per-scale plane windows)
NSLOT = 3


def whiten_max_scale(sf: ScalingFunction, max_halo: int = R_COL) -> int:
    """Largest scale whose power-smooth halo hw·2^s fits the window."""
    s = 0
    while sf.half_width * (2 ** (s + 1)) <= max_halo:
        s += 1
    return s  # scales 0..s usable iff hw·2^s <= max_halo


def _row_halo(sf: ScalingFunction, s: int) -> int:
    """Aligned per-scale row halo (multiple of 16: covers the f32 (8,128)
    and bf16 (16,128) tilings)."""
    r = sf.half_width * (2 ** s)
    return max(-(-r // 16) * 16, 16)


def _axis_cases(n_tiles: int, T: int, R: int, total: int):
    """Static DMA variants along one axis for a clamped halo window.

    Each case: (predicate(idx), src_start(idx), dst_offset, size,
    mirror_low, mirror_high).  The symmetric border is reconstructed
    in-kernel by mirroring (np.pad-symmetric semantics) when the window
    is clamped at the image edge."""
    cases = []
    if n_tiles == 1:
        cases.append((lambda i: i == 0, lambda i: 0, R, T, True, True))
        return cases
    cases.append((lambda i: i == 0, lambda i: 0, R, T + R, True, False))
    cases.append(
        (lambda i: i == n_tiles - 1,
         lambda i: total - T - R, 0, T + R, False, True))
    if n_tiles > 2:
        cases.append(
            (lambda i: jnp.logical_and(i > 0, i < n_tiles - 1),
             lambda i: i * T - R, 0, T + 2 * R, False, False))
    return cases


def _col_cases_reuse(n_tiles: int, T: int, R: int):
    """Column DMA variants under edge reuse (``n_tiles ≥ 2``): tiles
    ``j > 0`` take the left ``2R`` window columns from the previous
    tile's saved edge panel and DMA only the fresh columns."""
    cases = [(lambda j: j == 0, lambda j: 0, R, T + R, True, False)]
    if n_tiles > 2:
        cases.append(
            (lambda j: jnp.logical_and(j > 0, j < n_tiles - 1),
             lambda j: j * T + R, 2 * R, T, False, False))
    cases.append(
        (lambda j: j == n_tiles - 1,
         lambda j: j * T + R, 2 * R, T - R, False, True))
    return cases


def _make_whiten_kernel(n_fast: int, taps: Tuple[float, ...],
                        TH: int, TW: int, ni: int, nj: int,
                        halos, layout, soft: bool, write_planes: bool,
                        n_pieces: int, batch_major: bool = False,
                        write_gamma: bool = False,
                        reuse: bool = False):
    hw = (len(taps) - 1) // 2

    def kernel(*refs):
        fac_ref, thr_ref = refs[0], refs[1]
        pieces = refs[2:2 + n_pieces]
        out_idx = 2 + n_pieces
        recon_ref = refs[out_idx]
        n_out = 1
        planes_ref = None
        if write_planes:
            planes_ref = refs[out_idx + n_out]
            n_out += 1
        gamma_ref = None
        if write_gamma:
            gamma_ref = refs[out_idx + n_out]
            n_out += 1
        scratch0 = out_idx + n_out
        if reuse:
            bufs, t1, edge_ref, sems = refs[scratch0:scratch0 + 4]
        else:
            bufs, t1, sems = refs[scratch0:scratch0 + 3]
            edge_ref = None

        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)

        def win_cases(s):
            Rr = halos[s]
            rcases = _axis_cases(ni, TH, Rr, ni * TH)
            if reuse:
                ccases = _col_cases_reuse(nj, TW, R_COL)
            else:
                ccases = _axis_cases(nj, TW, R_COL, nj * TW)
            return Rr, rcases, ccases

        def win_dma_do(slot, s, action):
            """Emit the start/wait for scale s's window under the static
            case grid (one case executes per tile).  Dynamic starts like
            ``j·TW − R`` are tiling-aligned by construction but Mosaic's
            divisibility analysis cannot prove it through the
            subtraction — assert it with ``pl.multiple_of``."""
            k, row = layout[s]
            Rr, rcases, ccases = win_cases(s)
            src = pieces[k]
            for (rp, rs, rdo, rsz, _, _) in rcases:
                for (cp, cs, cdo, csz, _, _) in ccases:
                    @pl.when(jnp.logical_and(rp(i), cp(j)))
                    def _(rs=rs, cs=cs, rdo=rdo, cdo=cdo, rsz=rsz,
                          csz=csz):
                        r0, c0 = rs(i), cs(j)
                        if not isinstance(r0, int):
                            r0 = pl.multiple_of(r0, 8)
                        if not isinstance(c0, int):
                            c0 = pl.multiple_of(c0, 128)
                        dma = pltpu.make_async_copy(
                            src.at[row, b,
                                   pl.ds(r0, rsz),
                                   pl.ds(c0, csz)],
                            bufs.at[slot,
                                    pl.ds(rdo, rsz),
                                    pl.ds(cdo, csz)],
                            sems.at[slot])
                        getattr(dma, action)()

        def mirror(slot, s):
            """Fill the clamped window's missing border by symmetric
            reflection (exact flip via MXU matmul)."""
            Rr, rcases, ccases = win_cases(s)
            nr = TH + 2 * Rr
            Jr = _flip_mats(Rr, bufs.dtype)
            Jc = _flip_mats(R_COL, bufs.dtype)
            buf = bufs.at[slot, 0:nr, :]
            # rows first over the full width, then columns over the full
            # row extent — np.pad applies axes sequentially, so the
            # corner is the mirror of the mirror (garbage cols copied by
            # the row mirror are overwritten by the col mirror)
            for (rp, _, rdo, rsz, mlo, mhi) in rcases:
                if mlo:
                    @pl.when(rp(i))
                    def _():
                        buf[0:Rr, :] = _exact_dot_left(
                            Jr, buf[Rr:2 * Rr, :])
                if mhi:
                    @pl.when(rp(i))
                    def _():
                        buf[TH + Rr:TH + 2 * Rr, :] = _exact_dot_left(
                            Jr, buf[TH:TH + Rr, :])
            for (cp, _, cdo, _, mlo, mhi) in ccases:
                if mlo:
                    @pl.when(cp(j))
                    def _():
                        buf[:, 0:R_COL] = _exact_dot(
                            buf[:, R_COL:2 * R_COL], Jc)
                if mhi:
                    @pl.when(cp(j))
                    def _():
                        buf[:, TW + R_COL:TW + 2 * R_COL] = _exact_dot(
                            buf[:, TW:TW + R_COL], Jc)

        for s in range(min(n_fast, NSLOT)):
            win_dma_do(s, s, "start")

        acc = jnp.zeros((TH, TW), jnp.float32)
        gacc = jnp.zeros((TH, TW), jnp.float32) if write_gamma else None
        for s in range(n_fast):
            slot = s % NSLOT
            win_dma_do(slot, s, "wait")
            Rr = halos[s]
            nr = TH + 2 * Rr
            if reuse:
                # interior tiles: left window columns come from the
                # previous tile's saved edge (pristine plane values)
                @pl.when(j > 0)
                def _():
                    bufs[slot, 0:nr, 0:2 * R_COL] = edge_ref[s, 0:nr]
            mirror(slot, s)
            if reuse:
                # save the right-edge overlap for the next tile before
                # the slot buffer is recycled as conv scratch
                @pl.when(j < nj - 1)
                def _():
                    edge_ref[s, 0:nr] = bufs[slot, 0:nr,
                                             TW:TW + 2 * R_COL]
            # keep the interior detail values as a register/temp value —
            # the slot buffer is recycled as conv scratch below
            wc = bufs[slot, Rr:Rr + TH,
                      R_COL:R_COL + TW].astype(jnp.float32)

            # power plane; borders exact because reflection commutes
            # with squaring and there is no cross-scale chaining
            t1[0:nr, :] = bufs[slot, 0:nr, :] * bufs[slot, 0:nr, :]
            d = 2 ** s
            _conv_pass_ref(t1.at[0:nr, :], bufs.at[slot, 0:nr, :],
                           taps, d, 0)
            _conv_pass_ref(bufs.at[slot, 0:nr, :], t1.at[0:nr, :],
                           taps, d, 1)
            lp = t1[Rr:Rr + TH, R_COL:R_COL + TW].astype(jnp.float32)
            lp = jnp.sqrt(jnp.where(lp <= 0, jnp.float32(1e-15), lp))
            thr = thr_ref[s, b]
            safe_t = jnp.where(thr == 0, jnp.float32(1.0), thr)
            if soft:
                mask = _erf_pos(jnp.abs(wc) / safe_t)
            else:
                mask = (jnp.abs(wc) > safe_t).astype(jnp.float32)
            mask = jnp.where(thr == 0, jnp.float32(1.0), mask)
            masked = wc * mask
            white = masked * (fac_ref[s, b] / lp)
            acc = acc + white
            if write_gamma:
                # gamma-blend input: masked but unweighted/unwhitened
                # plane sum (watroo/utils.py:204-205)
                gacc = gacc + masked
            if write_planes:
                if batch_major:
                    planes_ref[0, s] = white.astype(planes_ref.dtype)
                else:
                    planes_ref[s, 0] = white.astype(planes_ref.dtype)
            if s + NSLOT < n_fast:
                win_dma_do(slot, s + NSLOT, "start")

        recon_ref[0] = acc.astype(recon_ref.dtype)
        if write_gamma:
            gamma_ref[0] = gacc.astype(gamma_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("sf", "n_fast", "layout", "soft", "write_planes",
                     "batch_major", "out_rows_total", "write_gamma",
                     "interpret"))
def fused_whiten_pieces(
    pieces,
    factors: jax.Array,
    thresholds: jax.Array,
    sf: ScalingFunction,
    n_fast: int,
    layout: Tuple[Tuple[int, int], ...],
    soft: bool = True,
    write_planes: bool = True,
    batch_major: bool = False,
    out_rows_total: int = 0,
    write_gamma: bool = False,
    interpret: bool = False,
):
    """Whiten detail scales 0..n_fast−1 read from decompose *pieces*.

    ``pieces``: tuple of plane cubes, each ``(rows, B, H, W)`` (batch
    may be 1); ``layout[s] = (piece, row)`` locates scale ``s``.
    ``factors``: multiplier table (w_s · power_norm_s), shape
    ``(n_fast,)`` (shared across frames) or ``(n_fast, B)`` (per-frame,
    e.g. batched ``preserve_variance`` norms);
    ``thresholds[s, b]``: per-frame significance threshold (0 → none).

    Returns ``(whitened (n_fast, B, H, W) or None, partial_recon
    (B, H, W))``.  With ``batch_major=True`` the whitened planes come
    out ``(B, n_fast, H, W)`` — written in that layout by the kernel,
    so frame-stack consumers (wow_stack) pay no relayout.
    ``out_rows_total > n_fast`` (batch-major only) sizes the plane cube
    ``(B, out_rows_total, H, W)`` with rows ≥ n_fast left
    *uninitialized* — the caller fills them with in-place
    ``dynamic_update_slice`` (deep/residual rows), avoiding a full-cube
    concat copy.

    ``write_gamma=True`` adds a third output ``(B, H, W)``: the sum of
    the *masked but unweighted/unwhitened* detail planes — the
    gamma-blend tone-map input (watroo/utils.py:204-205) — accumulated
    in VMEM alongside the whitened partial, so a gamma-blend WOW costs
    one extra output write instead of an extra cube read."""
    _, B, H, W = pieces[0].shape
    halos = tuple(_row_halo(sf, s) for s in range(n_fast))
    assert all(sf.half_width * 2 ** s <= R_COL for s in range(n_fast)), \
        "scale gated by whiten_max_scale"
    TH = 256
    TW = 512 if (W % 512 == 0 and not write_planes) else 256
    if H % TH or W % TW:
        raise ValueError("shape not tileable")
    ni, nj = H // TH, W // TW
    Rmax = max(halos)
    dt = pieces[0].dtype
    reuse = nj > 1

    kernel = _make_whiten_kernel(
        n_fast, sf.taps, TH, TW, ni, nj, halos, layout, soft,
        write_planes, len(pieces), batch_major, write_gamma, reuse)
    grid = (B, ni, nj)

    out_shapes = [jax.ShapeDtypeStruct((B, H, W), dt)]
    out_specs = [pl.BlockSpec((1, TH, TW), lambda b, i, j: (b, i, j),
                              memory_space=pltpu.VMEM)]
    if write_planes and batch_major:
        n_rows = max(out_rows_total, n_fast)
        out_shapes.append(
            jax.ShapeDtypeStruct((B, n_rows, H, W), dt))
        # the block covers rows 0..n_fast-1 only; rows beyond stay
        # untouched for the caller to fill in place
        out_specs.append(
            pl.BlockSpec((1, n_fast, TH, TW),
                         lambda b, i, j: (b, 0, i, j),
                         memory_space=pltpu.VMEM))
    elif write_planes:
        out_shapes.append(
            jax.ShapeDtypeStruct((n_fast, B, H, W), dt))
        out_specs.append(
            pl.BlockSpec((n_fast, 1, TH, TW),
                         lambda b, i, j: (0, b, i, j),
                         memory_space=pltpu.VMEM))
    if write_gamma:
        out_shapes.append(jax.ShapeDtypeStruct((B, H, W), dt))
        out_specs.append(
            pl.BlockSpec((1, TH, TW), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM))

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=tuple(out_shapes),
        in_specs=(
            [pl.BlockSpec(memory_space=pltpu.SMEM),
             pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * len(pieces)),
        out_specs=tuple(out_specs),
        scratch_shapes=(
            [pltpu.VMEM((NSLOT, TH + 2 * Rmax, TW + 2 * R_COL), dt),
             pltpu.VMEM((TH + 2 * Rmax, TW + 2 * R_COL), dt)]
            + ([pltpu.VMEM((n_fast, TH + 2 * Rmax, 2 * R_COL), dt)]
               if reuse else [])
            + [pltpu.SemaphoreType.DMA((NSLOT,))]),
        interpret=interpret,
    )(jnp.broadcast_to(factors.astype(jnp.float32).reshape(n_fast, -1),
                       (n_fast, B)),
      jnp.broadcast_to(thresholds.astype(jnp.float32).reshape(n_fast, -1),
                       (n_fast, B)),
      *pieces)
    outs = list(outs)
    recon = outs.pop(0)
    planes = outs.pop(0) if write_planes else None
    if write_gamma:
        return planes, recon, outs.pop(0)
    return planes, recon
