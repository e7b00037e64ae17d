"""Pallas TPU kernel: fused WOW whitening stage.

After decomposition, WOW whitens each detail plane by its local power:
``c ← c · sig(c) · w / sqrt(max(smooth_s(c²), 1e-15))``
(watroo/utils.py:174-203).  The XLA path spends one full dilated-smooth
round trip per scale on ``smooth_s(c²)`` plus several elementwise
passes.  This kernel processes each tile once: for every scale it DMAs
the detail tile + a *per-scale* halo ``hw·2^s`` (aligned up; small
scales read far less than the deepest one), squares, smooths (per-scale
dilation, exact symmetric borders — the pre-pad reflection commutes
with squaring and there is no cross-scale chaining), applies the
significance mask and whitening factor, stages the whitened plane out
asynchronously, and accumulates the partial reconstruction
(Σ whitened details) in VMEM — one extra output pass instead of L.

The residual plane (global-std normalization), deep scales whose halo
exceeds the VMEM window, gamma blending, and preserve_variance stay in
XLA (wavelets_tpu/models/wow.py dispatches).

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
from .pallas_conv import _conv_pass_ref

__all__ = ["fused_whiten", "whiten_max_scale"]

#: fixed outer pad of the plane stack; per-scale windows shrink inside it
R_MAX = 128

#: input DMA slots (prefetch depth for the per-scale plane windows)
NSLOT = 4


def _erf_pos(x):
    """erf for x ≥ 0 via Abramowitz & Stegun 7.1.26 (max abs error
    1.5e-7 — below f32 visibility for the erf-based significance mask).
    Mosaic has no erf lowering; this uses only exp and FMAs."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return 1.0 - poly * jnp.exp(-x * x)


def whiten_max_scale(sf: ScalingFunction, max_halo: int = R_MAX) -> int:
    """Largest scale whose power-smooth halo hw·2^s fits the window."""
    s = 0
    while sf.half_width * (2 ** (s + 1)) <= max_halo:
        s += 1
    return s  # scales 0..s usable iff hw·2^s <= max_halo


def _scale_halos(sf: ScalingFunction, n_scales: int):
    """Aligned per-scale halo: rows shrink with the scale (multiples of
    8); columns stay at R_MAX — lane-dimension DMA offsets must be
    128-aligned, so the window cannot move horizontally inside the
    pad."""
    halos = []
    for s in range(n_scales):
        r = sf.half_width * (2 ** s)
        # rows multiple of 16: covers f32 (8,128) and bf16 (16,128) tiling
        halos.append((max(-(-r // 16) * 16, 16), R_MAX))
    return halos


def _make_whiten_kernel(n_scales: int, taps: Tuple[float, ...],
                        TH: int, TW: int, halos, soft: bool):
    def kernel(fac_ref, thr_ref, planes_hbm, out_ref, recon_ref,
               bufs, tmp_ref, sm_ref, stage, acc, sems, osems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        ni = pl.num_programs(0)
        nj = pl.num_programs(1)
        step_id = i * nj + j

        def in_dma(st, s):
            Rr, Rc = halos[s]
            roff = pl.multiple_of(i * TH + (R_MAX - Rr), 8)
            coff = pl.multiple_of(j * TW + (R_MAX - Rc), 128)
            return pltpu.make_async_copy(
                planes_hbm.at[s,
                              pl.ds(roff, TH + 2 * Rr),
                              pl.ds(coff, TW + 2 * Rc)],
                bufs.at[st, 0:TH + 2 * Rr, 0:TW + 2 * Rc],
                sems.at[st])

        def out_dma(st, s, ii=None, jj=None):
            ii = i if ii is None else ii
            jj = j if jj is None else jj
            return pltpu.make_async_copy(
                stage.at[st],
                out_ref.at[s, pl.ds(ii * TH, TH), pl.ds(jj * TW, TW)],
                osems.at[st])

        # per-scale input windows are independent: keep up to NSLOT DMAs
        # in flight so later scales' transfers overlap earlier compute
        for s in range(min(n_scales, NSLOT)):
            in_dma(s, s).start()

        # the previous tile's last two plane copies are still in flight
        # (deferred drain): complete them before reusing the stage slots
        @pl.when(step_id > 0)
        def _():
            pstep = step_id - 1
            pi = pstep // nj
            pj = pstep % nj
            if n_scales >= 2:
                out_dma((n_scales - 2) % 2, n_scales - 2, pi, pj).wait()
            out_dma((n_scales - 1) % 2, n_scales - 1, pi, pj).wait()

        acc[:] = jnp.zeros((TH, TW), acc.dtype)

        for s in range(n_scales):
            Rr, Rc = halos[s]
            slot = s % NSLOT
            in_dma(slot, s).wait()
            w = bufs[slot, 0:TH + 2 * Rr, 0:TW + 2 * Rc]

            # power plane; image-border halo values come from the
            # symmetric pre-pad of the detail plane, and reflection
            # commutes with squaring, so borders are exact without
            # in-kernel mirroring (single smooth — no chaining)
            tmp_ref[0:TH + 2 * Rr, 0:TW + 2 * Rc] = w * w

            d = 2 ** s
            _conv_pass_ref(tmp_ref.at[0:TH + 2 * Rr, 0:TW + 2 * Rc],
                           sm_ref.at[0:TH + 2 * Rr, 0:TW + 2 * Rc],
                           taps, d, 0)
            _conv_pass_ref(sm_ref.at[0:TH + 2 * Rr, 0:TW + 2 * Rc],
                           tmp_ref.at[0:TH + 2 * Rr, 0:TW + 2 * Rc],
                           taps, d, 1)
            lp = tmp_ref[Rr:Rr + TH, Rc:Rc + TW].astype(jnp.float32)
            lp = jnp.sqrt(jnp.where(lp <= 0, jnp.float32(1e-15), lp))

            wc = w[Rr:Rr + TH, Rc:Rc + TW].astype(jnp.float32)
            thr = thr_ref[s]
            safe_t = jnp.where(thr == 0, jnp.float32(1.0), thr)
            if soft:
                mask = _erf_pos(jnp.abs(wc) / safe_t)
            else:
                mask = (jnp.abs(wc) > safe_t).astype(jnp.float32)
            mask = jnp.where(thr == 0, jnp.float32(1.0), mask)
            wden = wc * mask

            ost = s % 2
            if s >= 2:
                out_dma(ost, s - 2).wait()
            white = (wden * (fac_ref[s] / lp)).astype(stage.dtype)
            stage[ost] = white
            acc[:] = acc[:] + white
            out_dma(ost, s).start()
            # slot s%NSLOT is free once this scale's reads are done;
            # refill it with the window NSLOT scales ahead
            if s + NSLOT < n_scales:
                in_dma(slot, s + NSLOT).start()

        recon_ref[:] = acc[:]

        # the final tile must drain its own trailing copies before exit
        @pl.when(step_id == ni * nj - 1)
        def _():
            if n_scales >= 2:
                out_dma((n_scales - 2) % 2, n_scales - 2).wait()
            out_dma((n_scales - 1) % 2, n_scales - 1).wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("sf", "n_scales", "soft", "n_total", "interpret"))
def fused_whiten(
    planes: jax.Array,
    factors: jax.Array,
    thresholds: jax.Array,
    sf: ScalingFunction,
    n_scales: int,
    soft: bool = True,
    n_total: int = None,
    interpret: bool = False,
):
    """Whiten detail planes 0..n_scales−1 of ``planes``.

    ``factors[s]``: scalar multiplier (w_s · power_norm_s);
    ``thresholds[s]``: significance threshold (0 → none).
    Returns ``(whitened_planes, partial_recon (H, W))`` where the plane
    cube has ``n_total+1`` planes (default ``n_scales``): the kernel
    fills 0..n_scales−1 and leaves the rest for the caller to insert in
    place (deep scales + residual) — avoiding a full re-stack copy.
    """
    _, H, W = planes.shape
    halos = _scale_halos(sf, n_scales)
    assert all(r <= R_MAX and c <= R_MAX for r, c in halos), \
        "scale gated by whiten_max_scale"
    # (512, 256) tiles: big enough to amortize per-step cost, small
    # enough that the two max-halo windows + conv scratch fit VMEM
    TH = 512 if H % 512 == 0 else 256
    TW = 256
    if H % TH or W % TW:
        raise ValueError("shape not tileable")
    body = planes[:n_scales]
    padded = jnp.pad(body, ((0, 0), (R_MAX, R_MAX), (R_MAX, R_MAX)),
                     mode="symmetric")
    kernel = _make_whiten_kernel(n_scales, sf.taps, TH, TW, halos, soft)
    grid = (H // TH, W // TW)
    Rr_max = max(r for r, _ in halos)
    Rc_max = max(c for _, c in halos)
    n_out = n_scales if n_total is None else n_total + 1
    dt = planes.dtype
    out, recon = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((n_out, H, W), dt),
            jax.ShapeDtypeStruct((H, W), dt),
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
            pltpu.VMEM((min(n_scales, NSLOT), TH + 2 * Rr_max,
                        TW + 2 * Rc_max), dt),
            pltpu.VMEM((TH + 2 * Rr_max, TW + 2 * Rc_max), dt),
            pltpu.VMEM((TH + 2 * Rr_max, TW + 2 * Rc_max), dt),
            pltpu.VMEM((2, TH, TW), dt),
            pltpu.VMEM((TH, TW), dt),
            pltpu.SemaphoreType.DMA((min(n_scales, NSLOT),)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(factors.astype(jnp.float32), thresholds.astype(jnp.float32), padded)
    return out, recon
