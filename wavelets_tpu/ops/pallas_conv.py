"""Pallas TPU kernel: fused multi-scale à trous decomposition.

The XLA shift-add path (ops/conv.py) round-trips every scale through HBM:
scale s reads smooth_s and writes smooth_{s+1} and the detail plane, so a
6-scale decomposition moves ~20 images of traffic.  This kernel keeps the
whole scale pyramid VMEM-resident: each (TH, TW) tile is DMA'd in once
with a halo of R = hw·(2^L − 1), all L scale smoothings and differences
run on-chip, and only the L+1 output planes are written back — HBM
traffic drops to ~(1 + overlap) reads + (L+1) writes of the image.

Correctness contract (vs watroo/wavelets.py:408-444 standard algorithm):

* Scale-0 boundary values come from a one-shot symmetric pre-pad of the
  input (XLA pad, cheap).
* Scales ≥ 1 must reflect the *current smooth* at the image border
  (the standard path pads smooth_s per scale).  Border tiles therefore
  re-mirror their halo in-kernel before each scale.  Mosaic cannot lower
  ``rev`` (flip), so the mirror is an anti-diagonal permutation matmul
  on the MXU, made exact for f32 via a bf16×3 split (each component is
  exactly representable in bf16, the permutation matrix is 0/1, and
  accumulation is f32 — bitwise-exact reversal, verified in tests).
* Interior halos accumulate "garbage creep" of hw·2^s per side per
  scale from the un-refilled slice edges; the creep total equals R, so
  the central tile is untouched — the same validity argument as
  overlap-save convolution.

Dispatch policy (see :func:`fused_decompose`): 2-D float32,
non-bilateral, symmetric boundary, tile-divisible shapes; anything else
falls back to the XLA path.  Levels beyond the fused group (VMEM-bound,
default ≤ 6) chain through the XLA path on the residual.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .filters import ScalingFunction

__all__ = ["fused_decompose", "can_fuse", "plan_groups", "MAX_FUSED_LEVELS"]

#: largest scale group kept fully VMEM-resident (R = hw·(2^L−1) halo)
MAX_FUSED_LEVELS = 6

#: input DMA slots (depth-2 prefetch hides the per-tile DMA wait)
N_SLOTS = 3


def _flip_mats(R: int, dtype):
    """Anti-diagonal permutation matrix for in-kernel reversal."""
    row = lax.broadcasted_iota(jnp.int32, (R, R), 0)
    col = lax.broadcasted_iota(jnp.int32, (R, R), 1)
    return (row + col == R - 1).astype(dtype)


def _exact_dot(a, b):
    """Exact matmul with a 0/1 permutation matrix.  f32 inputs use a
    bf16×3 split (the MXU rounds f32 inputs to bf16; the three-term
    split is lossless); bf16 inputs are already exact on the MXU."""
    dot = lambda x: jax.lax.dot_general(
        x, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if a.dtype == jnp.bfloat16:
        return dot(a).astype(jnp.bfloat16)
    hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    mid = (a - hi).astype(jnp.bfloat16).astype(jnp.float32)
    lo = a - hi - mid
    return dot(hi) + dot(mid) + dot(lo)


def _exact_dot_left(a, b):
    dot = lambda x: jax.lax.dot_general(
        a, x, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    if b.dtype == jnp.bfloat16:
        return dot(b).astype(jnp.bfloat16)
    hi = b.astype(jnp.bfloat16).astype(jnp.float32)
    mid = (b - hi).astype(jnp.bfloat16).astype(jnp.float32)
    lo = b - hi - mid
    return dot(hi) + dot(mid) + dot(lo)


def _conv_pass_ref(src_ref, dst_ref, taps, d: int, axis: int):
    """One 1-D dilated conv pass between full-size VMEM refs via static
    slices; only the interior [hw·d, n−hw·d) of ``dst`` along ``axis`` is
    written (the edges go stale — "garbage creep" — and are accounted for
    by the halo budget, as in overlap-save convolution)."""
    hw = (len(taps) - 1) // 2
    n = src_ref.shape[axis]
    m = hw * d

    def sl(lo, hi):
        if axis == 0:
            return src_ref[lo:hi, :]
        return src_ref[:, lo:hi]

    dt = src_ref.dtype
    out = sl(m, n - m).astype(jnp.float32) * taps[hw]
    for j in range(1, hw + 1):
        left = sl(m - j * d, n - m - j * d).astype(jnp.float32)
        right = sl(m + j * d, n - m + j * d).astype(jnp.float32)
        out = out + taps[hw + j] * (left + right)
    out = out.astype(dt)
    if axis == 0:
        dst_ref[m:n - m, :] = out
    else:
        dst_ref[:, m:n - m] = out


def _aligned_halos(R: int) -> Tuple[int, int]:
    """Halo widths rounded up for TPU tiling: sublane extent (TH+2Rr)
    must be a multiple of 16 (covers both the f32 (8,128) and bf16
    (16,128) tilings), lane extent (TW+2Rc) a multiple of 128 (TH/TW
    are multiples of 128)."""
    Rr = -(-R // 16) * 16
    Rc = -(-R // 64) * 64
    return max(Rr, 16), max(Rc, 64)


def _make_kernel(level: int, taps: Tuple[float, ...], TH: int, TW: int,
                 R: int, offset: int = 0):
    Rr, Rc = _aligned_halos(R)

    def kernel(x_hbm, out_ref, bufs, tmp_ref, sm_ref, stage, sems,
               osems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        ni = pl.num_programs(0)
        nj = pl.num_programs(1)
        step = i * nj + j
        slot = step % N_SLOTS

        def in_dma(st, ii, jj):
            return pltpu.make_async_copy(
                x_hbm.at[pl.ds(ii * TH, TH + 2 * Rr),
                         pl.ds(jj * TW, TW + 2 * Rc)],
                bufs.at[st], sems.at[st])

        # warm-up: first grid step issues its own DMA and the next's
        @pl.when(step == 0)
        def _():
            in_dma(slot, i, j).start()

            @pl.when(ni * nj > 1)
            def _():
                in_dma(1 % N_SLOTS, 1 // nj, 1 % nj).start()

        # depth-2 prefetch: issue the DMA two tiles ahead
        nstep = step + 2
        @pl.when(nstep < ni * nj)
        def _():
            in_dma(nstep % N_SLOTS, nstep // nj, nstep % nj).start()

        in_dma(slot, i, j).wait()

        def out_dma(st, plane, ii=None, jj=None):
            ii = i if ii is None else ii
            jj = j if jj is None else jj
            return pltpu.make_async_copy(
                stage.at[st],
                out_ref.at[plane, pl.ds(ii * TH, TH),
                           pl.ds(jj * TW, TW)],
                osems.at[st])

        # the previous step's last two plane copies are still in flight
        # (deferred drain): complete them before reusing the stage slots
        @pl.when(step > 0)
        def _():
            pstep = step - 1
            pi = pstep // nj
            pj = pstep % nj
            if level >= 1:
                out_dma((level - 1) % 2, level - 1, pi, pj).wait()
            out_dma(level % 2, level, pi, pj).wait()

        Jr = _flip_mats(Rr, bufs.dtype)
        Jc = _flip_mats(Rc, bufs.dtype)
        # ping-pong refs: cur holds smooth_s, tmp the row pass, sm the
        # scale result; cur and sm swap roles each scale.  The DMA slot
        # buffer doubles as the first cur.
        refs = [bufs.at[slot], tmp_ref, sm_ref]
        cur = refs[0]
        for s in range(level):
            tmp = refs[1]
            sm = refs[2]
            if s > 0:
                # re-mirror the image-border halo with the *current*
                # smooth (per-scale symmetric pad semantics,
                # watroo/wavelets.py:77 / cv2 BORDER_REFLECT)
                @pl.when(j == 0)
                def _():
                    cur[:, 0:Rc] = _exact_dot(cur[:, Rc:2 * Rc], Jc)

                @pl.when(j == nj - 1)
                def _():
                    cur[:, Rc + TW:TW + 2 * Rc] = _exact_dot(
                        cur[:, TW:TW + Rc], Jc)

                @pl.when(i == 0)
                def _():
                    cur[0:Rr, :] = _exact_dot_left(Jr, cur[Rr:2 * Rr, :])

                @pl.when(i == ni - 1)
                def _():
                    cur[Rr + TH:TH + 2 * Rr, :] = _exact_dot_left(
                        Jr, cur[TH:TH + Rr, :])

            d = 2 ** (s + offset)
            _conv_pass_ref(cur, tmp, taps, d, 0)
            _conv_pass_ref(tmp, sm, taps, d, 1)
            # stage the detail plane and stream it out asynchronously
            # (double-buffered: wait for the copy issued two scales ago)
            ost = s % 2
            if s >= 2:
                out_dma(ost, s - 2).wait()
            stage[ost] = (cur[Rr:Rr + TH, Rc:Rc + TW]
                          - sm[Rr:Rr + TH, Rc:Rc + TW])
            out_dma(ost, s).start()
            refs = [sm, tmp, cur]  # sm becomes cur; old cur is reusable
            cur = refs[0]
        ost = level % 2
        if level >= 2:
            out_dma(ost, level - 2).wait()
        stage[ost] = cur[Rr:Rr + TH, Rc:Rc + TW]
        out_dma(ost, level).start()

        # only the final grid step must drain before the kernel exits;
        # every other step's trailing copies are waited by its successor
        @pl.when(step == ni * nj - 1)
        def _():
            if level >= 1:
                out_dma((level - 1) % 2, level - 1).wait()
            out_dma(level % 2, level).wait()

    return kernel


def _pick_tile(n: int, preferred=(512, 256, 128)) -> Optional[int]:
    for t in preferred:
        if n % t == 0 and n >= t:
            return t
    return None


def _vmem_bytes(TH: int, TW: int, level: int, R: int) -> int:
    """Rough VMEM footprint: 2 DMA slots + tmp + sm + ~1 Mosaic temp of
    buffer size, plus the 2 output staging tiles."""
    Rr, Rc = _aligned_halos(R)
    buf = (TH + 2 * Rr) * (TW + 2 * Rc) * 4
    stage = 2 * TH * TW * 4
    return (N_SLOTS + 3) * buf + stage


def _plan_tiles(H: int, W: int, level: int, R: int,
                budget: int = 13 << 20) -> Optional[Tuple[int, int]]:
    """Largest tile pair (by area, then squareness) meeting the VMEM
    budget and dividing the image."""
    cands = []
    for TH in (512, 256, 128):
        if H % TH:
            continue
        for TW in (512, 256, 128):
            if W % TW:
                continue
            if max(_aligned_halos(R)) > min(TH, TW):
                continue
            if _vmem_bytes(TH, TW, level, R) <= budget:
                cands.append((TH * TW, -abs(TH - TW), TH, TW))
    if not cands:
        return None
    _, _, TH, TW = max(cands)
    return TH, TW


def can_fuse(x, level: int, sf: ScalingFunction, bilateral, axes,
             boundary: str, backend: Optional[str] = None) -> bool:
    """Whether the fused Pallas path applies (TPU, 2-D f32, standard
    algorithm, tile-divisible)."""
    if bilateral is not None or level < 1:
        return False
    if boundary != "symmetric":
        return False
    if x.ndim != 2 or (axes is not None and tuple(axes) != (0, 1)):
        return False
    # f32 only: the kernels are dtype-generic (bf16 verified), but in
    # bf16 the plain XLA path is faster — halved HBM traffic benefits
    # XLA's fusions fully, while the kernels are bounded by per-step
    # overheads that do not shrink with the dtype.
    if x.dtype != jnp.float32:
        return False
    if backend is None:
        backend = jax.default_backend()
    if backend in ("cpu",):
        return False  # XLA path is the CPU reference; interpret mode is
        # exercised explicitly in tests
    groups, _ = plan_groups(x.shape[0], x.shape[1], level,
                            sf.half_width)
    return bool(groups)


def _group_halo(hw: int, offset: int, g: int) -> int:
    """Reach of a fused group of ``g`` scales starting at ``offset``:
    hw·2^offset·(2^g − 1)."""
    return hw * (2 ** offset) * ((2 ** g) - 1)


@functools.partial(
    jax.jit, static_argnames=("level", "sf", "offset", "interpret"))
def _fused_group(x: jax.Array, level: int, sf: ScalingFunction,
                 offset: int = 0, interpret: bool = False) -> jax.Array:
    """Fused decomposition of ``level`` scales at dilation base
    ``2^offset``.  Returns ``(level+1, H, W)``: detail planes for scales
    offset..offset+level−1 plus the residual."""
    H, W = x.shape
    R = _group_halo(sf.half_width, offset, level)
    TH, TW = _plan_tiles(H, W, level, R)
    Rr, Rc = _aligned_halos(R)
    xp = jnp.pad(x, ((Rr, Rr), (Rc, Rc)), mode="symmetric")
    kernel = _make_kernel(level, sf.taps, TH, TW, R, offset)
    grid = (H // TH, W // TW)
    dt = x.dtype
    out = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((level + 1, H, W), dt),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((N_SLOTS, TH + 2 * Rr, TW + 2 * Rc), dt),
            pltpu.VMEM((TH + 2 * Rr, TW + 2 * Rc), dt),
            pltpu.VMEM((TH + 2 * Rr, TW + 2 * Rc), dt),
            pltpu.VMEM((2, TH, TW), dt),
            pltpu.SemaphoreType.DMA((N_SLOTS,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp)
    return out


#: max halo-amplification (compute overhead) tolerated per fused group
_AMP_LIMIT = 2.0


def _group_amp(H, W, g, R):
    tiles = _plan_tiles(H, W, g, R)
    if tiles is None:
        return None
    TH, TW = tiles
    Rr, Rc = _aligned_halos(R)
    return (TH + 2 * Rr) * (TW + 2 * Rc) / (TH * TW)


def plan_groups(H: int, W: int, level: int, hw: int):
    """Split ``level`` scales into fused groups with bounded halo
    amplification; returns a list of (offset, g) pairs followed by the
    number of trailing scales left to the XLA path.

    Rationale: the kernel is VPU-bound through the halo overlap factor
    ((TH+2R)(TW+2R))/(TH·TW), so each group keeps R small; chaining
    groups costs one extra HBM round trip of the residual, which is
    cheap by comparison."""
    groups = []
    s = 0
    while s < level:
        best = None
        for g in range(min(level - s, MAX_FUSED_LEVELS), 0, -1):
            R = _group_halo(hw, s, g)
            amp = _group_amp(H, W, g, R)
            if amp is not None and amp <= _AMP_LIMIT:
                best = g
                break
        if best is None:
            break
        groups.append((s, best))
        s += best
    return groups, level - s


def fused_decompose(
    x: jax.Array,
    level: int,
    sf: ScalingFunction,
    *,
    interpret: bool = False,
    xla_tail=None,
) -> jax.Array:
    """Multi-scale decomposition chaining fused scale groups; scales
    whose dilation is too wide for VMEM halos run through
    ``xla_tail(residual, n, offset)`` — supplied by core.transform to
    avoid an import cycle."""
    H, W = x.shape
    groups, n_tail = plan_groups(H, W, level, sf.half_width)
    pieces = []
    cur = x
    for offset, g in groups:
        planes = _fused_group(cur, g, sf, offset=offset,
                              interpret=interpret)
        pieces.append(planes[:g])
        cur = planes[g]
    if n_tail:
        assert xla_tail is not None
        tail = xla_tail(cur, n_tail, level - n_tail)
        pieces.append(tail)
    else:
        pieces.append(cur[None])
    return jnp.concatenate(pieces, axis=0)
