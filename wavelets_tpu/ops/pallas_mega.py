"""Pallas TPU kernel: fully-fused WOW (decompose + whiten, one pass).

For the flagship ≤6-scale configuration the whole WOW pipeline fits one
VMEM residency per tile: the input is read once with a halo of
``R = hw·(3·2^(L−1) − 1)`` (chain reach for smooth_L plus the power
smooth at the deepest scale), every scale's smoothing, detail
difference, power smoothing, significance masking and whitening run
on-chip, and only the L whitened planes + the raw residual + the
partial reconstruction are written back.  HBM traffic ≈ one amplified
read + (L+2) plane writes — versus the two-kernel path (decompose
writes L+1 planes, whiten re-reads them with halos and writes L more).

Border semantics follow the standard algorithm exactly:
* scale-0 halo values come from the symmetric pre-pad;
* scales ≥ 1 re-mirror the *current smooth* at image-edge tiles
  (per-scale symmetric pad, watroo/wavelets.py:77) via the bf16×3
  anti-diagonal MXU matmul from pallas_conv;
* the power plane is re-mirrored the same way before its smooth
  (reference smooths the power plane with its own symmetric pad,
  watroo/utils.py:194).

Validity budget per scale s: the smooth chain consumes
``hw·(2^(s+1)−1)`` of interior halo and the power smooth another
``hw·2^s`` — R covers ``hw·(3·2^s−1)`` for every s < L.

The noise threshold inputs are known scalars (SMEM); the lazy-MAD case
computes w₀'s median beforehand (models/wow.py)."""

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
    _exact_dot,
    _exact_dot_left,
    _flip_mats,
)
from .pallas_wow import _erf_pos

__all__ = ["fused_wow_mega", "mega_max_levels"]


def mega_max_levels(sf: ScalingFunction, max_halo_rows: int = 192) -> int:
    """Largest L with hw·(3·2^(L−1) − 1) within the halo budget."""
    L = 0
    while sf.half_width * (3 * 2 ** L - 1) <= max_halo_rows:
        L += 1
    return L


def _halos(sf: ScalingFunction, level: int) -> Tuple[int, int]:
    R = sf.half_width * (3 * 2 ** (level - 1) - 1)
    Rr = -(-R // 8) * 8
    # window offsets are tile-aligned; Rc only needs (TW+2Rc) % 128 == 0
    Rc = -(-R // 64) * 64
    return Rr, Rc


def _make_kernel(level: int, taps: Tuple[float, ...], TH: int, TW: int,
                 Rr: int, Rc: int, soft: bool):
    HB = TH + 2 * Rr
    WB = TW + 2 * Rc

    def kernel(fac_ref, thr_ref, x_hbm, out_ref, recon_ref,
               bufs, b1, b2, b3, stage, sems, osems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        ni = pl.num_programs(0)
        nj = pl.num_programs(1)
        step = i * nj + j
        slot = step % 2

        def in_dma(st, ii, jj):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(ii * TH, HB), pl.ds(jj * TW, WB)],
                bufs.at[st], sems.at[st])

        def out_dma(st, plane, ii=None, jj=None):
            ii = i if ii is None else ii
            jj = j if jj is None else jj
            return pltpu.make_async_copy(
                stage.at[st],
                out_ref.at[plane, pl.ds(ii * TH, TH), pl.ds(jj * TW, TW)],
                osems.at[st])

        @pl.when(step == 0)
        def _():
            in_dma(slot, i, j).start()

        nstep = step + 1
        @pl.when(nstep < ni * nj)
        def _():
            in_dma(nstep % 2, nstep // nj, nstep % nj).start()

        # drain the previous tile's trailing output copies
        @pl.when(step > 0)
        def _():
            pstep = step - 1
            pi = pstep // nj
            pj = pstep % nj
            if level >= 1:
                out_dma((level - 1) % 2, level - 1, pi, pj).wait()
            out_dma(level % 2, level, pi, pj).wait()

        in_dma(slot, i, j).wait()

        Jr = _flip_mats(Rr, jnp.float32)
        Jc = _flip_mats(Rc, jnp.float32)

        def mirror(ref):
            """Per-scale symmetric reflection at image-edge tiles."""
            @pl.when(j == 0)
            def _():
                ref[:, 0:Rc] = _exact_dot(ref[:, Rc:2 * Rc], Jc)

            @pl.when(j == nj - 1)
            def _():
                ref[:, Rc + TW:WB] = _exact_dot(ref[:, TW:TW + Rc], Jc)

            @pl.when(i == 0)
            def _():
                ref[0:Rr, :] = _exact_dot_left(Jr, ref[Rr:2 * Rr, :])

            @pl.when(i == ni - 1)
            def _():
                ref[Rr + TH:HB, :] = _exact_dot_left(Jr, ref[TH:TH + Rr, :])

        # accumulate the partial recon directly in the output block
        recon_ref[:] = jnp.zeros((TH, TW), jnp.float32)

        # buffer roles rotate; the DMA slot buffer is the first `cur`
        rot = [bufs.at[slot], b1, b2, b3]
        for s in range(level):
            cur, tmp, sm, pw = rot
            if s > 0:
                mirror(cur)
            d = 2 ** s
            # chained smoothing
            _conv_pass_ref(cur, tmp, taps, d, 0)
            _conv_pass_ref(tmp, sm, taps, d, 1)
            # detail plane w_s = c_s − c_{s+1} (full window)
            tmp[...] = cur[...] - sm[...]
            # local power: smooth_s(w²) with its own symmetric border
            cur[...] = tmp[...] * tmp[...]
            mirror(cur)
            _conv_pass_ref(cur, pw, taps, d, 0)
            _conv_pass_ref(pw, cur, taps, d, 1)
            lp = cur[Rr:Rr + TH, Rc:Rc + TW]
            lp = jnp.sqrt(jnp.where(lp <= 0, jnp.float32(1e-15), lp))

            wc = tmp[Rr:Rr + TH, Rc:Rc + TW]
            thr = thr_ref[s]
            safe_t = jnp.where(thr == 0, jnp.float32(1.0), thr)
            if soft:
                mask = _erf_pos(jnp.abs(wc) / safe_t)
            else:
                mask = (jnp.abs(wc) > safe_t).astype(jnp.float32)
            mask = jnp.where(thr == 0, jnp.float32(1.0), mask)

            ost = s % 2
            if s >= 2:
                out_dma(ost, s - 2).wait()
            white = (wc * mask) * (fac_ref[s] / lp)
            stage[ost] = white
            recon_ref[:] = recon_ref[:] + white
            out_dma(ost, s).start()

            # next scale: cur ← sm; freed buffers become scratch
            rot = [sm, tmp, cur, pw]

        # raw residual plane
        cur = rot[0]
        ost = level % 2
        if level >= 2:
            out_dma(ost, level - 2).wait()
        stage[ost] = cur[Rr:Rr + TH, Rc:Rc + TW]
        out_dma(ost, level).start()

        @pl.when(step == ni * nj - 1)
        def _():
            if level >= 1:
                out_dma((level - 1) % 2, level - 1).wait()
            out_dma(level % 2, level).wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("sf", "level", "soft", "interpret"))
def fused_wow_mega(
    x: jax.Array,
    factors: jax.Array,
    thresholds: jax.Array,
    sf: ScalingFunction,
    level: int,
    soft: bool = True,
    interpret: bool = False,
):
    """One-pass WOW over ``level`` scales.

    Returns ``(planes (level+1, H, W), partial_recon (H, W))`` where
    planes 0..level−1 are whitened details and plane ``level`` is the
    *raw* residual (its global-std normalization happens in XLA).
    ``factors``/``thresholds``: per-scale (level,) scalars."""
    H, W = x.shape
    Rr, Rc = _halos(sf, level)
    TH = TW = 256
    if H % TH or W % TW:
        raise ValueError("shape not tileable")
    xp = jnp.pad(x, ((Rr, Rr), (Rc, Rc)), mode="symmetric")
    kernel = _make_kernel(level, sf.taps, TH, TW, Rr, Rc, soft)
    grid = (H // TH, W // TW)
    HB, WB = TH + 2 * Rr, TW + 2 * Rc
    planes, recon = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((level + 1, H, W), jnp.float32),
            jax.ShapeDtypeStruct((H, W), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((TH, TW), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, HB, WB), jnp.float32),
            pltpu.VMEM((HB, WB), jnp.float32),
            pltpu.VMEM((HB, WB), jnp.float32),
            pltpu.VMEM((HB, WB), jnp.float32),
            pltpu.VMEM((2, TH, TW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(factors.astype(jnp.float32), thresholds.astype(jnp.float32), xp)
    return planes, recon
