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

Pipelining: the output plane cube rides a BlockSpec-driven revolving
window (Mosaic overlaps the copies with the next step's compute at no
per-step scalar cost); only the overlapping *input* windows use manual
DMA (depth-1 prefetch into two slots).  A leading batch grid dimension
serves frame stacks (wow_stack) with the same kernel.

Dispatch policy (see :func:`fused_decompose`): 2-D (or batched 2-D)
float32/bfloat16, non-bilateral, symmetric boundary, tile-divisible
shapes; anything else falls back to the XLA path.  Group partitioning is
cost-model-driven (``plan_groups``): measured HBM bandwidth, per-step
overhead, and VPU throughput decide how many scales fuse per kernel and
which scales chain through the XLA path on the residual.
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
from .layout import stack_planes

__all__ = ["fused_decompose", "can_fuse", "plan_groups",
           "can_fuse_volume", "fused_volume_decompose",
           "MAX_FUSED_LEVELS"]

#: largest scale group kept fully VMEM-resident (R = hw·(2^L−1) halo)
MAX_FUSED_LEVELS = 6

#: input DMA slots (depth-1 prefetch; the current slot doubles as the
#: scale-0 working buffer, so in-flight transfers only ever target the
#: other slot)
N_SLOTS = 2


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


def _erf_pos(x):
    """erf for x ≥ 0 via Abramowitz & Stegun 7.1.26 (max abs error
    1.5e-7 — below f32 visibility for the erf-based significance mask).
    Mosaic has no erf lowering; this uses only exp and FMAs."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return 1.0 - poly * jnp.exp(-x * x)


def _conv_pass_ref(src_ref, dst_ref, taps, d: int, axis: int):
    """One 1-D dilated conv pass between full-size VMEM refs via static
    slices; only the interior [hw·d, n−hw·d) of ``dst`` along ``axis`` is
    written (the edges go stale — "garbage creep" — and are accounted for
    by the halo budget, as in overlap-save convolution).

    (A ``pltpu.roll``-based formulation with fully aligned stores was
    measured *slower* on v5e — lane/sublane rotations cost more than
    Mosaic's handling of the unaligned shifted reads.)"""
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
                 R: int, offset: int = 0, whiten=None,
                 reuse: bool = False, smooth_only: bool = False,
                 bs_input: bool = False):
    """Decompose kernel, optionally with the WOW whitening stage fused
    per scale (``whiten = (soft, masked_tuple, planes)``): instead of
    the raw detail plane, each output row is the *whitened* detail
    ``(c·mask)·(w/sqrt(max(smooth_s(c²),1e-15)))`` and a partial
    reconstruction accumulates — the raw plane cube never exists in HBM
    (watroo/utils.py:174-203 fused into the decompose pass).  With
    ``planes=False`` only the final carry row is emitted (serving paths
    that discard coefficients skip g plane writes per group).  The halo
    budget grows to R = hw·2^off·(3·2^(g−1)−1): each scale's power
    smooth consumes one extra hw·d_s of margin on top of the chain."""
    Rr, Rc = _aligned_halos(R)
    hw = (len(taps) - 1) // 2

    def kernel(*refs):
        if whiten is not None:
            # whitened planes leave as *separate* outputs (one array per
            # row) so rows-layout consumers pay zero slice copies — a
            # single cube output forced one HBM round trip per fast
            # plane downstream (measured ~0.35 ms/plane at 4k²)
            n_rows = (level + 1) if whiten[2] else 1
            fac_ref, thr_ref, x_hbm = refs[:3]
            outs = refs[3:3 + n_rows]
            acc_ref = refs[3 + n_rows]
            bufs, tmp_ref, sm_ref, pw_ref = refs[4 + n_rows:8 + n_rows]
            rest = refs[8 + n_rows:]
        else:
            x_hbm, out_ref, bufs, tmp_ref, sm_ref = refs[:5]
            rest = refs[5:]
        if bs_input:
            # BlockSpec-input mode (round-5 serving groups): the input
            # window arrives as a Mosaic-pipelined block (pre-tiled by
            # the caller), so there is no in-kernel DMA to serialize
            # against the output copies — measured ~0.6 ms better
            # overlap at 4k than the manual-DMA scheme (PROBES_r05 #5).
            sems = edge_ref = lsems = None
        elif reuse:
            edge_ref, sems, lsems = rest
        else:
            (sems,) = rest
            edge_ref = lsems = None
        b = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        ni = pl.num_programs(1)
        nj = pl.num_programs(2)
        nsteps = pl.num_programs(0) * ni * nj
        step = (b * ni + i) * nj + j
        slot = step % N_SLOTS

        def _coords(which):
            bb = which // (ni * nj)
            rem = which % (ni * nj)
            return bb, rem // nj, rem % nj

        def in_dma(st, which):
            bb, ii, jj = _coords(which)
            return pltpu.make_async_copy(
                x_hbm.at[bb,
                         pl.ds(ii * TH, TH + 2 * Rr),
                         pl.ds(jj * TW, TW + 2 * Rc)],
                bufs.at[st], sems.at[st])

        # column-halo reuse: tile j+1's window overlaps tile j's by 2Rc
        # columns (pristine input — saved before compute trashes the
        # buffer), so interior tiles DMA only the TW fresh columns; the
        # left 2Rc come from the previous step's edge save.  Band
        # starts (j == 0) additionally fetch the left strip.
        def fresh_dma(st, which):
            bb, ii, jj = _coords(which)
            return pltpu.make_async_copy(
                x_hbm.at[bb,
                         pl.ds(ii * TH, TH + 2 * Rr),
                         pl.ds(jj * TW + 2 * Rc, TW)],
                bufs.at[st, :, 2 * Rc:TW + 2 * Rc], sems.at[st])

        def left_dma(st, which):
            bb, ii, jj = _coords(which)
            return pltpu.make_async_copy(
                x_hbm.at[bb,
                         pl.ds(ii * TH, TH + 2 * Rr),
                         pl.ds(jj * TW, 2 * Rc)],
                bufs.at[st, :, 0:2 * Rc], lsems.at[st])

        def start(st, which):
            if not reuse:
                in_dma(st, which).start()
                return
            _, _, jj = _coords(which)
            fresh_dma(st, which).start()

            @pl.when(jj == 0)
            def _():
                left_dma(st, which).start()

        def wait(st, which):
            if not reuse:
                in_dma(st, which).wait()
                return
            _, _, jj = _coords(which)
            fresh_dma(st, which).wait()

            @pl.when(jj == 0)
            def _():
                left_dma(st, which).wait()

        if bs_input:
            # the pre-tiled window block is read-only; copy it into the
            # working buffer (VMEM→VMEM, ~µs) so the scale chain can
            # ping-pong in place
            bufs[...] = x_hbm[0]
        else:
            # warm-up: first grid step issues its own DMA
            @pl.when(step == 0)
            def _():
                start(slot, step)

            # depth-1 prefetch into the other slot; the current slot is
            # a working buffer for this step, so only the inactive slot
            # ever has a transfer in flight
            @pl.when(step + 1 < nsteps)
            def _():
                start((step + 1) % N_SLOTS, step + 1)

            wait(slot, step)
        if reuse and not bs_input:
            buf = bufs.at[slot]

            # interior tiles: left halo from the previous tile's saved
            # edge (ping-pong indexed by slot parity)
            @pl.when(j > 0)
            def _():
                buf[:, 0:2 * Rc] = edge_ref[1 - slot]

            # save this tile's right-edge overlap for the next tile
            # while the buffer still holds pristine input
            @pl.when(j < nj - 1)
            def _():
                edge_ref[slot] = buf[:, TW:TW + 2 * Rc]

        Jr = _flip_mats(Rr, bufs.dtype)
        Jc = _flip_mats(Rc, bufs.dtype)
        planes = True
        if whiten is not None:
            soft, masked, planes = whiten
            acc = jnp.zeros((TH, TW), jnp.float32)
        # ping-pong refs: cur holds smooth_s, tmp the row pass, sm the
        # scale result; cur and sm swap roles each scale.  The DMA slot
        # buffer doubles as the first cur.
        refs = [bufs if bs_input else bufs.at[slot], tmp_ref, sm_ref]
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
            if whiten is None:
                if not smooth_only:
                    # detail plane straight into the revolving output
                    # window (Mosaic overlaps the copy-out with the
                    # next step)
                    out_ref[s, 0] = (cur[Rr:Rr + TH, Rc:Rc + TW]
                                     - sm[Rr:Rr + TH, Rc:Rc + TW])
            else:
                # fused whiten: detail (with margin for the power conv —
                # its window-edge reflection is inherited from cur's
                # mirror, since reflection commutes with subtraction and
                # squaring), local power smooth, significance, whiten
                pw_ref[...] = cur[...] - sm[...]
                wc = pw_ref[Rr:Rr + TH, Rc:Rc + TW].astype(jnp.float32)
                tmp[...] = pw_ref[...] * pw_ref[...]
                _conv_pass_ref(tmp, cur, taps, d, 0)
                _conv_pass_ref(cur, tmp, taps, d, 1)
                lp = tmp[Rr:Rr + TH, Rc:Rc + TW].astype(jnp.float32)
                lp = jnp.sqrt(jnp.where(lp <= 0, jnp.float32(1e-15), lp))
                if masked[s]:
                    thr = thr_ref[s, b]
                    safe_t = jnp.where(thr == 0, jnp.float32(1.0), thr)
                    if soft:
                        mask = _erf_pos(jnp.abs(wc) / safe_t)
                    else:
                        mask = (jnp.abs(wc) > safe_t).astype(jnp.float32)
                    wc = wc * jnp.where(thr == 0, jnp.float32(1.0), mask)
                white = wc * (fac_ref[s] / lp)
                if planes:
                    outs[s][0] = white.astype(outs[s].dtype)
                acc = acc + white
            refs = [sm, tmp, cur]  # sm becomes cur; old cur is reusable
            cur = refs[0]
        carry_out = (outs[level if planes else 0]
                     if whiten is not None else None)
        if whiten is None:
            out_ref[0 if smooth_only else level, 0] = \
                cur[Rr:Rr + TH, Rc:Rc + TW]
        else:
            carry_out[0] = cur[Rr:Rr + TH, Rc:Rc + TW]
            acc_ref[0] = acc.astype(acc_ref.dtype)

    return kernel


#: measured platform constants (perf_probe.py on the axon v5e): plain
#: XLA streams at ~700-860 GB/s; a manual-DMA grid step costs ~5-10 µs
#: of scalar sequencing; the VPU sustains ~3.5 Top/s on f32 stencils.
#: Mosaic scoped-VMEM ceiling override: the default (~21 MB) forces
#: tile plans whose grid-step count dominates wall time (6 us/step);
#: the v5e has 128 MiB of VMEM, so kernels request a higher ceiling
#: and _plan_tiles prices the bigger tiles (probe: scripts/r4_tile_probe.py)
_VMEM_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 << 20)

_BW = 700e9
_STEP_OVH = 4e-6
_VPU = 3.5e12
_VPU_EFF = 1.1e12
#: XLA shift-add fallback cost per scale, expressed in image-moves at
#: _BW (measured ~2.07 ms/scale at 4k² f32 → ≈ 21 effective moves: the
#: pads materialize and the pass fusions stream well below the copy
#: ceiling)
_XLA_SCALE_BYTES = 20.0


def _vmem_bytes(TH: int, TW: int, level: int, R: int,
                itemsize: int = 4, whiten: bool = False,
                reuse: bool = False) -> int:
    """VMEM footprint: input slots + tmp + sm working buffers (input
    dtype), Mosaic elementwise temps (always f32 — the conv passes
    accumulate in f32, so bf16 runs need twice the temp headroom
    relative to their buffers; measured 17 MB scoped at the old
    accounting), plus the double-buffered revolving output window.
    The fused-whiten variant adds the detail window buffer and the
    (tiny) partial-recon output; column-halo reuse adds two edge-save
    panels."""
    Rr, Rc = _aligned_halos(R)
    window = (TH + 2 * Rr) * (TW + 2 * Rc)
    buf = window * itemsize
    n_temps = 1 if itemsize == 4 else 2
    n_work = N_SLOTS + 2 + (1 if whiten else 0)
    out_win = 2 * (level + 1) * TH * TW * itemsize
    if whiten:
        out_win += 2 * TH * TW * itemsize
    edge = N_SLOTS * (TH + 2 * Rr) * 2 * Rc * itemsize if reuse else 0
    return n_work * buf + n_temps * window * 4 + out_win + edge


def _group_cost(H, W, g, R, TH, TW, itemsize, whiten: bool = False):
    """Cost model (seconds) for one fused group over the full image.

    Round-4 refit against a hardware tile sweep (scripts/r4_tile_probe
    on the v5e, group (0,4) at 4k²: 3.22/3.05/2.77 ms for 256×512 /
    512×512 / 1024×1024): the whiten kernels behave as *serialized*
    DMA + VPU (the in-step wait → fold → copy-out chain overlaps
    poorly), with an effective VPU rate near 1.1 Tops for the strided
    ext-buffer folds and ~4 µs/grid-step sequencing.  max()-overlap
    with the paper VPU rate underpriced big tiles by 3×."""
    Rr, Rc = _aligned_halos(R)
    steps = (H // TH) * (W // TW)
    if W // TW > 1:
        # column-halo reuse: each row band reads W + 2Rc columns once
        amp = (1 + 2 * Rr / TH) * (1 + 2 * Rc / W)
    else:
        amp = (TH + 2 * Rr) * (TW + 2 * Rc) / (TH * TW)
    # whiten adds the partial-recon write and doubles the conv work
    # (power smooth per scale)
    bytes_ = H * W * itemsize * (amp + g + 1 + (1 if whiten else 0))
    vpu_amp = (TH + 2 * Rr) * (TW + 2 * Rc) / (TH * TW)
    vpu = H * W * vpu_amp * g * (4 if whiten else 2) * 6
    return bytes_ / _BW + vpu / _VPU_EFF + steps * _STEP_OVH


def _pad_split(n: int, R: int, T: int) -> Tuple[int, int, int]:
    """One-sided pad plan for a non-tile-divisible extent: the smallest
    multiple ``np`` of ``T`` with ``np ≥ n + R``, all pad on the high
    side.  Padding by ≥ the group's reach ``R`` is *bitwise* exact:
    symmetric extension commutes with the symmetric tap folds (the
    extension of the smooth is the smooth of the extension), so every
    value an original-domain output reads from the padded region equals
    the per-scale reflection the standard algorithm would have produced
    (watroo/wavelets.py:408-444 pads per scale); the kernel's own
    border mirror at the padded right edge only pollutes the pad
    region, ≥ R away from any original-domain output (the overlap-save
    creep budget).  The low side is NOT padded — tile 0 starts at the
    true image border, so (round 5) outputs align to the tile grid and
    leave the kernel as *ragged* unpadded arrays (Mosaic masks the
    last block's out-of-range stores; verified bitwise on hardware,
    PROBES_r05) with no crop copies.  Returns ``(pad_lo=0, pad_hi,
    np)``; ``(0, 0, n)`` when already divisible."""
    if n % T == 0:
        return 0, 0, n
    np_ = -(-(n + R) // T) * T
    return 0, np_ - n, np_


def _plan_tiles(H: int, W: int, level: int, R: int, itemsize: int = 4,
                budget: int = 90 << 20,
                whiten: bool = False) -> Optional[Tuple[int, int]]:
    """Cheapest feasible tile pair under the cost model.  Extents that
    are not tile-divisible are priced at their padded size (see
    :func:`_pad_split`) and capped at 1.15× the minimal achievable
    padded area: the cost model's step-overhead vs padded-area
    trade-off mispredicts on heavily padded plans (round-5 odd-shape
    probe: the model picked a 1.40× plan measured 1.68× slower than
    the 4096² baseline), so plans that mostly compute padding are
    excluded outright.  Non-power-of-two tile extents (multiples of
    128) are allowed — they fit odd shapes with far less padding."""
    sizes = (1024, 768, 512, 384, 256, 128)
    cands = []
    for TH in sizes:
        Hp = _pad_split(H, R, TH)[2]
        for TW in sizes:
            Wp = _pad_split(W, R, TW)[2]
            if max(_aligned_halos(R)) > min(TH, TW):
                continue
            if _vmem_bytes(TH, TW, level, R, itemsize, whiten,
                           reuse=Wp // TW > 1) <= budget:
                cands.append(
                    (_group_cost(Hp, Wp, level, R, TH, TW, itemsize,
                                 whiten), Hp * Wp, TH, TW))
    if not cands:
        return None
    min_area = min(c[1] for c in cands)
    cands = [c for c in cands if c[1] <= 1.15 * min_area]
    _, _, TH, TW = min(cands)
    return TH, TW


def can_fuse(x, level: int, sf: ScalingFunction, bilateral, axes,
             boundary: str, backend: Optional[str] = None) -> bool:
    """Whether the fused Pallas path applies (TPU, 2-D or batched 2-D
    f32, standard algorithm, tile-divisible)."""
    if bilateral is not None or level < 1:
        return False
    if boundary != "symmetric":
        return False
    spatial = tuple(range(x.ndim - 2, x.ndim))
    if x.ndim not in (2, 3) or (axes is not None
                                and tuple(axes) != spatial):
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
    groups, _ = plan_groups(x.shape[-2], x.shape[-1], level,
                            sf.half_width)
    return bool(groups)


def _group_halo(hw: int, offset: int, g: int) -> int:
    """Reach of a fused group of ``g`` scales starting at ``offset``:
    hw·2^offset·(2^g − 1)."""
    return hw * (2 ** offset) * ((2 ** g) - 1)


@functools.partial(
    jax.jit, static_argnames=("level", "sf", "offset", "interpret",
                              "smooth_only"))
def _fused_group(x: jax.Array, level: int, sf: ScalingFunction,
                 offset: int = 0, interpret: bool = False,
                 smooth_only: bool = False) -> jax.Array:
    """Fused decomposition of ``level`` scales at dilation base
    ``2^offset``.  ``x`` is ``(H, W)`` or a frame stack ``(B, H, W)``;
    returns ``(level+1, *x.shape)``: detail planes for scales
    offset..offset+level−1 plus the residual.  ``smooth_only=True``
    emits just the final smooth carry ``(1, *x.shape)`` — the 3-D
    volume fast path's in-plane pass, where the 3-D detail is formed
    only after the axial pass (watroo/wavelets.py:47-64) and writing
    the 2-D details would be a wasted image move per scale."""
    batched = x.ndim == 3
    xb = x if batched else x[None]
    B, H, W = xb.shape
    R = _group_halo(sf.half_width, offset, level)
    TH, TW = _plan_tiles(H, W, level, R, x.dtype.itemsize)
    # non-tile-divisible extents: one-sided pad by >= R (bitwise-exact,
    # see _pad_split); outputs leave ragged (unpadded) — no crops
    _, _, Hp = _pad_split(H, R, TH)
    _, _, Wp = _pad_split(W, R, TW)
    Rr, Rc = _aligned_halos(R)
    xp = jnp.pad(xb, ((0, 0), (Rr, Rr + (Hp - H)),
                      (Rc, Rc + (Wp - W))), mode="symmetric")
    reuse = Wp // TW > 1
    kernel = _make_kernel(level, sf.taps, TH, TW, R, offset,
                          reuse=reuse, smooth_only=smooth_only)
    grid = (B, Hp // TH, Wp // TW)
    dt = x.dtype
    n_rows = 1 if smooth_only else level + 1
    scratch = [
        pltpu.VMEM((N_SLOTS, TH + 2 * Rr, TW + 2 * Rc), dt),
        pltpu.VMEM((TH + 2 * Rr, TW + 2 * Rc), dt),
        pltpu.VMEM((TH + 2 * Rr, TW + 2 * Rc), dt),
    ]
    if reuse:
        scratch.append(pltpu.VMEM((N_SLOTS, TH + 2 * Rr, 2 * Rc), dt))
    scratch.append(pltpu.SemaphoreType.DMA((N_SLOTS,)))
    if reuse:
        scratch.append(pltpu.SemaphoreType.DMA((N_SLOTS,)))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((n_rows, B, H, W), dt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (n_rows, 1, TH, TW),
            lambda b, i, j: (0, b, i, j),
            memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(xp)
    return out if batched else out[:, 0]


def _wow_group_halo(hw: int, offset: int, g: int) -> int:
    """Reach of a *whitening* group: each scale's power smooth consumes
    an extra hw·d_s of margin on top of the chain creep; the max is at
    the last scale: hw·2^offset·(3·2^(g−1) − 1)."""
    return hw * (2 ** offset) * (3 * (2 ** (g - 1)) - 1)


@functools.partial(
    jax.jit, static_argnames=("g", "sf", "offset", "soft", "masked",
                              "need_cube", "interpret", "bs_input"))
def _fused_wow_group(x: jax.Array, factors: jax.Array,
                     thresholds: jax.Array, g: int, sf: ScalingFunction,
                     offset: int = 0, soft: bool = True,
                     masked: Tuple[bool, ...] = (),
                     need_cube: bool = True,
                     interpret: bool = False,
                     bs_input: Optional[bool] = None):
    """Fused decompose+whiten of ``g`` scales at dilation base
    ``2^offset``: returns ``(rows, acc)`` where ``rows`` is a tuple of
    g+1 arrays (shape of ``x``) — whitened detail planes 0..g−1 plus
    the raw carry at index g — and ``acc`` the partial reconstruction
    Σ whitened.  The raw detail planes never touch HBM, and each output
    row is its own array (a single cube output forced one slice-copy
    round trip per plane on the rows-layout path).  With
    ``need_cube=False`` (serving paths that discard coefficients)
    ``rows`` shrinks to the single carry — g plane writes per group are
    skipped; the tile plan (and thus the fold order and every emitted
    value) is unchanged.  Dtype-generic (f32 / bf16: the convs
    accumulate in f32 but inter-pass buffers round to the input dtype,
    matching the dtype-preserving engine); dispatch is gated in
    models/wow.py."""
    batched = x.ndim == 3
    xb = x if batched else x[None]
    B, H, W = xb.shape
    dt = x.dtype
    R = _wow_group_halo(sf.half_width, offset, g)
    TH, TW = _plan_tiles(H, W, g, R, dt.itemsize, whiten=True)
    _, _, Hp = _pad_split(H, R, TH)
    _, _, Wp = _pad_split(W, R, TW)
    Rr, Rc = _aligned_halos(R)
    xp = jnp.pad(xb, ((0, 0), (Rr, Rr + (Hp - H)),
                      (Rc, Rc + (Wp - W))), mode="symmetric")
    if bs_input is None:
        # measured OFF (round-5 hardware A/B, PROBES_r05 #7): the
        # standalone BlockSpec kernel pipelines ~0.6 ms better than the
        # manual-DMA scheme, but in the production dispatch the XLA
        # pretile copy (~0.45 ms at 4k) plus the full-window reads
        # (no column-halo reuse) give it all back — serving group
        # 2.47 ms (bs) vs 2.41 ms (manual).  Kept as an option for
        # platforms where the copy is cheaper relative to VMEM DMA.
        bs_input = False
    ni, nj = Hp // TH, Wp // TW
    reuse = (not bs_input) and nj > 1
    kernel = _make_kernel(g, sf.taps, TH, TW, R, offset,
                          whiten=(soft, tuple(masked), need_cube),
                          reuse=reuse, bs_input=bs_input)
    n_rows = g + 1 if need_cube else 1
    grid = (B, ni, nj)
    N = TH + 2 * Rr
    M = TW + 2 * Rc
    if bs_input:
        # materialize the overlapping windows (XLA slice-stack) so the
        # kernel input is pure BlockSpec — Mosaic pipelines input
        # prefetch, compute, and output copies with no in-kernel wait
        tiles = jnp.stack(
            [xp[b, i * TH:i * TH + N, j * TW:j * TW + M]
             for b in range(B) for i in range(ni) for j in range(nj)])
        scratch = [
            pltpu.VMEM((N, M), dt),
            pltpu.VMEM((N, M), dt),
            pltpu.VMEM((N, M), dt),
            pltpu.VMEM((N, M), dt),
        ]
        x_spec = pl.BlockSpec(
            (1, N, M),
            lambda b, i, j, _ni=ni, _nj=nj: ((b * _ni + i) * _nj + j,
                                             0, 0),
            memory_space=pltpu.VMEM)
        x_operand = tiles
    else:
        scratch = [
            pltpu.VMEM((N_SLOTS, N, M), dt),
            pltpu.VMEM((N, M), dt),
            pltpu.VMEM((N, M), dt),
            pltpu.VMEM((N, M), dt),
        ]
        if reuse:
            scratch.append(pltpu.VMEM((N_SLOTS, N, 2 * Rc), dt))
        scratch.append(pltpu.SemaphoreType.DMA((N_SLOTS,)))
        if reuse:
            scratch.append(pltpu.SemaphoreType.DMA((N_SLOTS,)))
        x_spec = pl.BlockSpec(memory_space=pl.ANY)
        x_operand = xp
    plane_spec = pl.BlockSpec((1, TH, TW), lambda b, i, j: (b, i, j),
                              memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=tuple([jax.ShapeDtypeStruct((B, H, W), dt)]
                        * (n_rows + 1)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  x_spec],
        out_specs=(plane_spec,) * (n_rows + 1),
        scratch_shapes=scratch,
        compiler_params=_VMEM_PARAMS,
        interpret=interpret,
    )(factors.astype(jnp.float32),
      jnp.broadcast_to(thresholds.astype(jnp.float32).reshape(g, -1),
                       (g, B)),
      x_operand)
    rows, acc = outs[:n_rows], outs[n_rows]
    if batched:
        return tuple(rows), acc
    return tuple(r[0] for r in rows), acc[0]


def can_fuse_volume(x, level: int, sf: ScalingFunction, axes,
                    boundary: str, backend: Optional[str] = None) -> bool:
    """Whether the 3-D volume fast path applies: a genuine (D, H, W)
    volume transform (axes covering all three — NOT a frame stack),
    f32, symmetric boundary, every scale's in-plane pass feasible as a
    single-scale fused group.  The reference's 3-D convolution is
    separable per-plane 2-D + axial 1-D (watroo/wavelets.py:47-64)."""
    if x.ndim != 3 or x.dtype != jnp.float32 or level < 1:
        return False
    if boundary != "symmetric":
        return False
    if axes is not None and tuple(a % 3 for a in axes) != (0, 1, 2):
        return False
    if backend is None:
        backend = jax.default_backend()
    if backend in ("cpu",):
        return False
    H, W = x.shape[-2:]
    for s in range(level):
        R = _group_halo(sf.half_width, s, 1)
        if _plan_tiles(H, W, 1, R, 4) is None:
            return False
    return True


def fused_volume_decompose(
    x: jax.Array,
    level: int,
    sf: ScalingFunction,
    *,
    interpret: bool = False,
) -> jax.Array:
    """3-D à trous decomposition of a volume ``(D, H, W)`` with the
    in-plane passes on the fused kernels.

    Per scale (same axis order as ``ops.conv.smooth``: axial, rows,
    cols — the fold arithmetic per axis is identical to
    ``separable_smooth_axis``, so the result matches the XLA volume
    path bitwise on hardware): the axial 1-D dilated pass runs in XLA
    (a leading-axis fold — cheap, and no VMEM window can hold a depth
    halo anyway), the (H, W) pass runs the batched single-scale fused
    kernel in ``smooth_only`` mode (depth rides the batch grid axis; 2
    image moves instead of XLA's ~7 per scale), and the 3-D detail
    difference + synthesis fuse in XLA.  Replaces the all-XLA volume
    route (28 ms for 64×1024², 3 scales, v5e — round-4 verdict item 6).
    Reference: separable 3-D convolution, watroo/wavelets.py:47-64."""
    from .conv import separable_smooth_axis

    planes = []
    cur = x
    for s in range(level):
        axial = separable_smooth_axis(cur, sf.taps, s, 0, "symmetric")
        c_next = _fused_group(axial, 1, sf, offset=s,
                              interpret=interpret, smooth_only=True)[0]
        planes.append(cur - c_next)
        cur = c_next
    planes.append(cur)
    return stack_planes(planes)


def plan_wow_groups(H: int, W: int, level: int, hw: int,
                    itemsize: int = 4):
    """Partition whitening scales 0..level−1 into fused
    decompose+whiten groups (same DP as :func:`plan_groups` with the
    bigger whiten halo); returns ``(groups, covered)`` where groups is
    a list of ``(offset, g)`` and covered is how many leading scales
    the plan reaches (groups only beat the kernel-pair path while the
    halo amplification stays bounded).  f32/bf16 only — the whiten
    kernels are not f64 territory."""
    if itemsize not in (2, 4):
        return [], 0
    INF = float("inf")
    best = [(0.0, None)] * (level + 1)
    for s in range(level - 1, -1, -1):
        cands = [(INF, None)]
        for g in range(1, min(level - s, MAX_FUSED_LEVELS) + 1):
            R = _wow_group_halo(hw, s, g)
            tiles = _plan_tiles(H, W, g, R, itemsize, whiten=True)
            if tiles is None:
                continue
            c = _group_cost(H, W, g, R, *tiles, itemsize, whiten=True)
            if s + g < level:
                c += 2 * H * W * itemsize / _BW
            if best[s + g][0] < INF or s + g == level:
                cands.append((c + best[s + g][0], g))
        best[s] = min(cands, key=lambda t: t[0])
    groups = []
    s = 0
    while s < level and best[s][1] is not None:
        groups.append((s, best[s][1]))
        s += best[s][1]
    return groups, s


def plan_wow_prefix(H: int, W: int, level: int, hw: int,
                    itemsize: int = 4):
    """Longest prefix of scales 0..k−1 fully coverable by whiten
    groups.  :func:`plan_wow_groups` only emits plans whose group
    chain connects to its ``level`` (deep offsets have infeasible
    halos, so a high level can make the whole chain unreachable even
    though a shorter prefix is cheap) — retry at shorter levels until
    the plan covers everything it was asked for.  Scales past the
    prefix run the per-scale tail dispatch (deep kernel or XLA)."""
    for k in range(level, 0, -1):
        groups, covered = plan_wow_groups(H, W, k, hw, itemsize)
        if covered == k:
            return groups, k
    return [], 0


def plan_groups(H: int, W: int, level: int, hw: int, itemsize: int = 4):
    """Partition ``level`` scales into fused groups; returns a list of
    ``(offset, g)`` pairs followed by the number of trailing scales left
    to the XLA path.

    Cost-model dynamic program: each candidate group is priced by the
    measured platform constants (HBM bandwidth, per-grid-step overhead,
    VPU rate) including the halo-amplification reads and the one-residual
    round trip between chained groups; a group is only scheduled where it
    beats the XLA shift-add fallback for those scales."""
    INF = float("inf")
    xla_scale = _XLA_SCALE_BYTES * H * W * itemsize / _BW
    # best[s] = (cost of scales s.., action); action = g or None (tail)
    best = [(0.0, None)] * (level + 1)
    for s in range(level - 1, -1, -1):
        cands = [((level - s) * xla_scale, None)]
        for g in range(1, min(level - s, MAX_FUSED_LEVELS) + 1):
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


def fused_decompose_pieces(
    x: jax.Array,
    level: int,
    sf: ScalingFunction,
    *,
    interpret: bool = False,
    xla_tail=None,
    defer_tail: bool = False,
):
    """Multi-scale decomposition as a list of *pieces* — no plane-cube
    concatenation (a full-cube concat costs ~2 image round trips per
    plane set; consumers that only need per-scale planes, like the
    whiten kernel, read straight from the group cubes).

    Returns ``(pieces, layout, tail)``: ``pieces[k]`` is a cube whose
    rows are detail planes; ``layout[s] = (k, row)`` locates scale
    ``s``; ``layout[level]`` locates the final residual.  Scales whose
    dilation is too wide for VMEM halos run through ``xla_tail(residual,
    n, offset)`` — supplied by core.transform to avoid an import cycle.
    With ``defer_tail=True`` those scales are instead left *uncomputed*:
    ``tail = (residual, n_tail)`` hands the smooth carry at scale
    ``level − n_tail`` to the consumer, which fuses the remaining
    smooth/difference steps into its own per-scale passes (models/wow.py
    whitening) — saving one detail-plane HBM round trip per deep scale.
    ``tail`` is None when every scale was computed.
    ``x``: ``(H, W)`` or ``(B, H, W)``."""
    H, W = x.shape[-2:]
    groups, n_tail = plan_groups(H, W, level, sf.half_width,
                                 x.dtype.itemsize)
    pieces = []
    layout = {}
    cur = x
    for offset, g in groups:
        planes = _fused_group(cur, g, sf, offset=offset,
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


def fused_decompose(
    x: jax.Array,
    level: int,
    sf: ScalingFunction,
    *,
    interpret: bool = False,
    xla_tail=None,
) -> jax.Array:
    """Plane-cube form of :func:`fused_decompose_pieces` (one concat)."""
    pieces, layout, _ = fused_decompose_pieces(
        x, level, sf, interpret=interpret, xla_tail=xla_tail)
    rows = [pieces[k][r] for s in range(level + 1)
            for (k, r) in [layout[s]]]
    return stack_planes(rows)
