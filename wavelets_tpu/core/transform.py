"""The à trous transform engine — functional core.

A TPU-first redesign of ``AtrousTransform`` (``watroo/wavelets.py:290-444``):

* **Pure and jit-compiled.**  ``decompose(x, level, sf, ...)`` is a pure
  function of the input array; ``level`` and the scaling function are
  static, so the per-scale loop unrolls at trace time into one XLA
  program — no Python↔native boundary crossings per scale/tap as in the
  reference (SURVEY §3.1).
* **Coefficients are an array**, shape ``(level+1, *x.shape)``: planes
  0..level−1 are detail coefficients (successive differences), plane
  ``level`` the smooth residual.  Synthesis is ``sum(planes, 0)`` and is
  exact by construction (the sum telescopes; watroo/wavelets.py:442).
* **The recursive algorithm is deliberately not ported.**  It is a CPU
  cache optimization (decimated sub-array convolution,
  watroo/wavelets.py:330-406) that is meaningless on TPU; its output
  contract (identical to the standard path in the interior, one-shot
  symmetric padding at the borders) is reproduced by
  ``decompose(..., recursive_borders=True)``.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.conv import (
    atrous_conv_nd,
    boundary_for_ndim,
    local_variance,
    smooth,
)
from ..ops.filters import ScalingFunction
from ..ops.layout import stack_planes

__all__ = [
    "decompose",
    "decompose_pieces",
    "assemble_pieces",
    "synthesize",
    "decompose_fn",
    "normalize_bilateral",
]


def normalize_bilateral(bilateral, level: int):
    """Reference list-padding convention for per-scale bilateral σ
    (watroo/wavelets.py:349-352, :421-424): scalar → repeated level+1
    times; list shorter than level+1 → extended with 1s."""
    if bilateral is None:
        return None
    if isinstance(bilateral, (list, tuple)):
        sig = list(bilateral)
    else:
        sig = [bilateral] * (level + 1)
    if len(sig) <= level:
        sig.extend([1] * (level - len(sig) + 1))
    return tuple(float(s) for s in sig)


def _smooth_step(
    c: jax.Array,
    s: int,
    sf: ScalingFunction,
    axes: Tuple[int, ...],
    boundary: str,
    bilateral: Optional[Tuple[float, ...]],
    bilateral_scaling: bool,
):
    """One scale of the chained smoothing (watroo/wavelets.py:429-440)."""
    if bilateral is None:
        return smooth(c, sf, s, axes=axes, boundary=boundary)
    # Bilateral branch: range variance from the local variance estimator
    # scaled by the per-scale σ_b (watroo/wavelets.py:434-440).  The
    # bilateral kernel is not separable (data-dependent weights), so the
    # dense n-D kernel is used with dilated tap offsets.
    variance = local_variance(c, sf, s, axes=axes, boundary=boundary)
    variance = variance * jnp.asarray(bilateral[s] ** 2, c.dtype)
    if bilateral_scaling:
        variance = variance * (s + 1)
    kernel = sf.kernel_nd(len(axes))
    if len(axes) != c.ndim:
        # batched input: vmap the non-separable bilateral conv over the
        # leading (batch) axes.
        batch_axes = tuple(a for a in range(c.ndim) if a not in axes)
        if batch_axes != tuple(range(len(batch_axes))):
            raise ValueError("batch axes must be leading")
        f = lambda ci, vi: atrous_conv_nd(
            ci, kernel, s, bilateral_variance=vi, boundary="symmetric"
        )
        for _ in batch_axes:
            f = jax.vmap(f)
        return f(c, variance)
    return atrous_conv_nd(
        c, kernel, s, bilateral_variance=variance, boundary="symmetric"
    )


@partial(
    jax.jit,
    static_argnames=(
        "level",
        "sf",
        "axes",
        "bilateral",
        "bilateral_scaling",
        "recursive_borders",
        "boundary",
        "scale_offset",
        "use_pallas",
    ),
)
def decompose(
    x: jax.Array,
    level: int,
    sf: ScalingFunction,
    *,
    axes: Optional[Tuple[int, ...]] = None,
    bilateral: Optional[Tuple[float, ...]] = None,
    bilateral_scaling: bool = False,
    recursive_borders: bool = False,
    boundary: Optional[str] = None,
    scale_offset: int = 0,
    use_pallas: Optional[bool] = None,
) -> jax.Array:
    """À trous decomposition → coefficient cube ``(level+1, *x.shape)``.

    Standard algorithm (watroo/wavelets.py:408-444): chained smoothing with
    per-scale dilation ``2^s``; plane ``s`` = ``smooth_s − smooth_{s+1}``,
    plane ``level`` = residual.

    ``axes`` selects the spatial axes (default: all); leading non-spatial
    axes are treated as batch.  ``bilateral`` must already be normalized to
    a length-``level+1`` tuple (see :func:`normalize_bilateral`).

    ``recursive_borders=True`` reproduces the reference recursive
    algorithm's border contract: pad once by ``hw·2^(level−1)`` with
    symmetric reflection (watroo/wavelets.py:394-395), transform, crop.
    Interior values are identical to the standard path (SURVEY §2.4).

    ``scale_offset`` starts the dilation ladder at ``2^offset`` (used by
    the fused Pallas kernel to chain deep scales).  ``use_pallas``
    overrides the automatic fast-path dispatch (None = auto: TPU, 2-D
    float32, standard algorithm, tile-divisible shapes).
    """
    if axes is None:
        axes = tuple(range(x.ndim))
    axes = tuple(a % x.ndim for a in axes)
    if boundary is None:
        boundary = boundary_for_ndim(len(axes))

    if scale_offset == 0 and not recursive_borders:
        if bilateral is not None:
            from ..ops import pallas_bilateral

            fuse_b = use_pallas
            if fuse_b is None:
                fuse_b = pallas_bilateral.can_fuse_bilateral(
                    x, level, sf, axes, boundary)
            if fuse_b:
                def xla_tail(residual, n, offset):
                    return decompose(
                        residual, n, sf, axes=axes, boundary=boundary,
                        bilateral=bilateral,
                        bilateral_scaling=bilateral_scaling,
                        scale_offset=offset, use_pallas=False)

                pieces, layout, _ = pallas_bilateral.fused_bilateral_pieces(
                    x, level, sf, bilateral, bilateral_scaling,
                    xla_tail=xla_tail,
                    interpret=jax.default_backend() == "cpu")
                return stack_planes(
                    [pieces[k][r] for s in range(level + 1)
                     for (k, r) in [layout[s]]])
        else:
            from ..ops import pallas_conv

            if use_pallas is None:
                use_pallas = pallas_conv.can_fuse(
                    x, level, sf, bilateral, axes, boundary)
                if not use_pallas and pallas_conv.can_fuse_volume(
                        x, level, sf, axes, boundary):
                    # genuine 3-D volume: axial XLA pass + batched
                    # in-plane fused kernel per scale (pallas_conv.
                    # fused_volume_decompose; watroo/wavelets.py:47-64)
                    return pallas_conv.fused_volume_decompose(
                        x, level, sf,
                        interpret=jax.default_backend() == "cpu")
            if use_pallas:
                def xla_tail(residual, n, offset):
                    return decompose(
                        residual, n, sf, axes=axes, boundary=boundary,
                        scale_offset=offset, use_pallas=False)

                return pallas_conv.fused_decompose(
                    x, level, sf, xla_tail=xla_tail,
                    interpret=jax.default_backend() == "cpu")

    if recursive_borders:
        hw = sf.half_width * 2 ** (level - 1) if level > 0 else 0
        pad_widths = [(hw, hw) if a in axes else (0, 0) for a in range(x.ndim)]
        xp = jnp.pad(x, pad_widths, mode="symmetric")
        planes = decompose(
            xp, level, sf,
            axes=axes, bilateral=bilateral, bilateral_scaling=bilateral_scaling,
            recursive_borders=False, boundary=boundary,
        )
        crop = tuple(
            slice(hw, planes.shape[1 + a] - hw) if a in axes else slice(None)
            for a in range(x.ndim)
        )
        return planes[(slice(None),) + crop]

    planes = []
    c = x
    for s in range(level):
        c_next = _smooth_step(
            c, s + scale_offset, sf, axes, boundary, bilateral,
            bilateral_scaling
        )
        planes.append(c - c_next)
        c = c_next
    planes.append(c)
    return stack_planes(planes)


def decompose_pieces(
    x: jax.Array,
    level: int,
    sf: ScalingFunction,
    *,
    axes: Optional[Tuple[int, ...]] = None,
    bilateral: Optional[Tuple[float, ...]] = None,
    bilateral_scaling: bool = False,
    boundary: Optional[str] = None,
    use_pallas: Optional[bool] = None,
    defer_tail: bool = False,
):
    """Decomposition as ``(pieces, layout)`` — the fused kernels' native
    form, with no plane-cube concatenation.

    ``pieces`` is a tuple of cubes; ``layout[s] = (piece, row)`` locates
    the detail plane of scale ``s`` (and ``layout[level]`` the
    residual).  Consumers that whiten/denoise per scale (models/wow.py)
    read straight from the group cubes; :func:`decompose` is the
    one-cube convenience form.

    With ``defer_tail=True`` the return is ``(pieces, layout, tail)``:
    scales past the fused groups are left uncomputed and ``tail =
    (residual, n_tail)`` hands the smooth carry to the consumer (None
    when all scales were computed, in which case ``layout`` covers
    ``level + 1`` entries as usual)."""
    if axes is None:
        axes = tuple(range(x.ndim))
    axes = tuple(a % x.ndim for a in axes)
    if boundary is None:
        boundary = boundary_for_ndim(len(axes))

    if bilateral is not None:
        from ..ops import pallas_bilateral

        fuse_b = use_pallas
        if fuse_b is None:
            fuse_b = pallas_bilateral.can_fuse_bilateral(
                x, level, sf, axes, boundary)
        if fuse_b:
            def xla_tail(residual, n, offset):
                return decompose(
                    residual, n, sf, axes=axes, boundary=boundary,
                    bilateral=bilateral,
                    bilateral_scaling=bilateral_scaling,
                    scale_offset=offset, use_pallas=False)

            pieces, layout, tail = \
                pallas_bilateral.fused_bilateral_pieces(
                    x, level, sf, bilateral, bilateral_scaling,
                    xla_tail=xla_tail, defer_tail=defer_tail,
                    interpret=jax.default_backend() == "cpu")
            n_done = level + 1 - (tail[1] + 1 if tail is not None else 0)
            layout = tuple(layout[s] for s in range(n_done))
            if defer_tail:
                return tuple(pieces), layout, tail
            return tuple(pieces), layout
    else:
        from ..ops import pallas_conv

        if use_pallas is None:
            use_pallas = pallas_conv.can_fuse(
                x, level, sf, bilateral, axes, boundary)
        if use_pallas:
            def xla_tail(residual, n, offset):
                return decompose(
                    residual, n, sf, axes=axes, boundary=boundary,
                    scale_offset=offset, use_pallas=False)

            pieces, layout, tail = pallas_conv.fused_decompose_pieces(
                x, level, sf, xla_tail=xla_tail, defer_tail=defer_tail,
                interpret=jax.default_backend() == "cpu")
            n_done = level + 1 - (tail[1] + 1 if tail is not None else 0)
            layout = tuple(layout[s] for s in range(n_done))
            if defer_tail:
                return tuple(pieces), layout, tail
            return tuple(pieces), layout

    from ..ops import pallas_conv as _pc

    if (bilateral is None and use_pallas is None
            and _pc.can_fuse_volume(x, level, sf, axes, boundary)):
        planes = _pc.fused_volume_decompose(
            x, level, sf, interpret=jax.default_backend() == "cpu")
    else:
        planes = decompose(
            x, level, sf, axes=axes, bilateral=bilateral,
            bilateral_scaling=bilateral_scaling, boundary=boundary,
            use_pallas=False)
    layout = tuple((0, s) for s in range(level + 1))
    if defer_tail:
        return (planes,), layout, None
    return (planes,), layout


def assemble_pieces(pieces, layout) -> jax.Array:
    """Plane cube from ``(pieces, layout)``; free when the decomposition
    produced a single cube in scale order."""
    if len(pieces) == 1 and layout == tuple(
            (0, s) for s in range(len(layout))):
        return pieces[0]
    return stack_planes([pieces[k][r] for (k, r) in layout])


def synthesize(planes: jax.Array) -> jax.Array:
    """Inverse transform: plain sum of planes (watroo/utils.py:98,
    via ``Coefficients.__array__``).  Exact by construction."""
    return jnp.sum(planes, axis=0)


def decompose_fn(level, sf, **static_kwargs):
    """Partially-applied :func:`decompose` for use under vmap/shard_map."""
    return partial(decompose, level=level, sf=sf, **static_kwargs)
