"""Dilated ("à trous") convolution primitives in pure XLA.

Replaces the reference's native delegations — ``cv2.filter2D`` for 2-D/3-D
(``watroo/wavelets.py:35-64``), ``scipy.ndimage.convolve`` for 1-D
(``:66-69``), and the generic shift-and-accumulate ``atrous_convolution``
(``:74-105``) — with jit-compilable shift-and-add programs.  Design notes:

* Dilation is an indexing stride: the à trous kernel's zeros are never
  materialized and never cost FLOPs or bandwidth.
* The separable n-D smoothing is two/three 1-D passes.  Each pass is a
  static unrolled sum of ``k`` dilated-shifted slices of a padded array —
  pure VPU work that XLA fuses into a single elementwise loop per pass.
  (The fused multi-scale Pallas kernel in ``pallas_conv.py`` goes further
  and keeps the whole scale pyramid in VMEM.)
* Symmetric taps (both reference filters) are folded pairwise:
  ``t_j·(x←j + x→j)``, halving the multiplies.
* Boundary conventions match the reference *per dimensionality*
  (verified numerically, SURVEY §2.4): 2-D/3-D use edge-duplicated
  symmetric reflection (cv2 ``BORDER_REFLECT`` ≡ ``np.pad symmetric``);
  the 1-D path uses whole-sample ``reflect`` (scipy ``mirror`` ≡
  reflect-101, ``watroo/wavelets.py:69``).
"""

from __future__ import annotations


from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .filters import ScalingFunction

__all__ = [
    "separable_smooth_axis",
    "smooth",
    "local_variance",
    "sdev_loc",
    "atrous_conv_nd",
    "boundary_for_ndim",
]


def boundary_for_ndim(n_dim: int) -> str:
    """Reference boundary mode per dimensionality (SURVEY §2.4).

    2-D/3-D: cv2 BORDER_REFLECT ≡ 'symmetric' (watroo/wavelets.py:39-64);
    1-D (and the >3-D guard path): scipy 'mirror' ≡ 'reflect'
    (watroo/wavelets.py:66-69).
    """
    return "symmetric" if n_dim in (2, 3) else "reflect"


def separable_smooth_axis(
    x: jax.Array,
    taps: Tuple[float, ...],
    scale: int,
    axis: int,
    boundary: str = "symmetric",
) -> jax.Array:
    """1-D dilated convolution along ``axis`` with dilation ``2**scale``.

    Pads only along ``axis`` and accumulates ``k`` shifted slices.
    ``taps``/``scale``/``axis``/``boundary`` are static under jit.
    """
    k = len(taps)
    hw = (k - 1) // 2
    if hw == 0:
        return x * taps[0]
    d = 2 ** scale
    pad = hw * d
    n = x.shape[axis]

    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (pad, pad)
    xp = jnp.pad(x, pad_widths, mode=boundary)

    def shifted(offset):
        # slice [pad + offset, pad + offset + n) along axis
        return lax.slice_in_dim(xp, pad + offset, pad + offset + n, axis=axis)

    symmetric = all(taps[i] == taps[-1 - i] for i in range(hw))
    out = x * taps[hw]
    if symmetric:
        for j in range(1, hw + 1):
            out = out + taps[hw + j] * (shifted(-j * d) + shifted(j * d))
    else:
        for j in range(1, hw + 1):
            out = out + taps[hw - j] * shifted(-j * d)
            out = out + taps[hw + j] * shifted(j * d)
    return out


def smooth(
    x: jax.Array,
    sf: ScalingFunction,
    scale: int = 0,
    axes: Optional[Sequence[int]] = None,
    boundary: Optional[str] = None,
) -> jax.Array:
    """Separable n-D dilated smoothing ≡ reference ``convolution``.

    Matches ``watroo/wavelets.py:35-71``: 2-D uses the full outer-product
    kernel (mathematically identical to two separable passes), 3-D is
    per-plane 2-D + axial 1-D (i.e. fully separable), 1-D uses scipy
    semantics.  ``axes=None`` smooths every axis of ``x``; pass explicit
    axes to smooth a batched stack (e.g. ``axes=(1, 2)`` for (B, H, W)).
    """
    if axes is None:
        axes = tuple(range(x.ndim))
    if boundary is None:
        boundary = boundary_for_ndim(len(axes))
    out = x
    for ax in axes:
        out = separable_smooth_axis(out, sf.taps, scale, ax, boundary)
    return out


def local_variance(
    x: jax.Array,
    sf: ScalingFunction,
    scale: int = 0,
    axes: Optional[Sequence[int]] = None,
    boundary: Optional[str] = None,
    floor: float = 1e-20,
) -> jax.Array:
    """Local variance ⟨x²⟩−⟨x⟩² under the scaling window at ``scale``.

    Mirrors ``sdev_loc(..., variance=True)`` (watroo/wavelets.py:24-32)
    including the ``≤0 → 1e-20`` clamp.
    """
    mean = smooth(x, sf, scale, axes, boundary)
    mean2 = mean * mean
    vari = smooth(x * x, sf, scale, axes, boundary) - mean2
    return jnp.where(vari <= 0, jnp.asarray(floor, vari.dtype), vari)


def sdev_loc(
    x: jax.Array,
    sf: ScalingFunction,
    scale: int = 0,
    variance: bool = False,
    axes: Optional[Sequence[int]] = None,
    boundary: Optional[str] = None,
) -> jax.Array:
    v = local_variance(x, sf, scale, axes, boundary)
    return v if variance else jnp.sqrt(v)


def _noncenter_offsets(shape: Tuple[int, ...]) -> list:
    """Tap offsets (relative to center, in tap units) for a dense n-D kernel,
    in the reference's iteration order (watroo/wavelets.py:89-91: meshgrid of
    descending indices, masked center)."""
    hws = tuple(s // 2 for s in shape)
    # reference: indices = meshgrid(linspace(shape-1, 0, shape)) → descending
    grids = np.meshgrid(
        *[np.arange(s - 1, -1, -1, dtype=int) for s in shape], indexing="ij"
    )
    mask = np.ones(shape, dtype=bool)
    mask[hws] = False
    offsets = []
    for flat in zip(*[g[mask] for g in grids]):
        offsets.append(tuple(int(i) - hw for i, hw in zip(flat, hws)))
    return offsets


def atrous_conv_nd(
    image: jax.Array,
    kernel: np.ndarray,
    scale: int = 0,
    bilateral_variance: Optional[jax.Array] = None,
    boundary: str = "symmetric",
) -> jax.Array:
    """Generic n-D à trous convolution, plus the bilateral variant.

    TPU-native rewrite of ``atrous_convolution`` (watroo/wavelets.py:74-105):
    the per-tap loop is unrolled at trace time; the bilateral range weight
    ``k·exp(−(x−x_shift)²/(2σ²))`` and its normalizer accumulate in the same
    fused elementwise program — no materialized ``shifted``/``weight``
    temporaries round-tripping through HBM.

    ``kernel`` is the dense *undilated* n-D kernel (host constant); dilation
    ``2**scale`` is applied to the tap offsets, so the kernel zeros are never
    touched.
    """
    kernel = np.asarray(kernel)
    if kernel.ndim != image.ndim:
        raise ValueError("kernel ndim must match image ndim")
    d = 2 ** scale
    hws = tuple(s // 2 for s in kernel.shape)
    pad_widths = [(hw * d, hw * d) for hw in hws]
    padded = jnp.pad(image, pad_widths, mode=boundary)

    center = float(kernel[hws])
    out = image * jnp.asarray(center, image.dtype)
    norm = None
    if bilateral_variance is not None:
        norm = jnp.full_like(image, center)
        inv_two_var = 0.5 / bilateral_variance

    def tap_slice(offset_taps):
        starts = [hw * d + o * d for hw, o in zip(hws, offset_taps)]
        s = padded
        for ax, (st, n) in enumerate(zip(starts, image.shape)):
            s = lax.slice_in_dim(s, st, st + n, axis=ax)
        return s

    for off in _noncenter_offsets(kernel.shape):
        k = float(kernel[tuple(hw + o for hw, o in zip(hws, off))])
        if k == 0.0:
            continue
        shifted = tap_slice(off)
        if bilateral_variance is None:
            out = out + shifted * jnp.asarray(k, image.dtype)
        else:
            diff = image - shifted
            w = jnp.asarray(k, image.dtype) * jnp.exp(-(diff * diff) * inv_two_var)
            norm = norm + w
            out = out + w * shifted

    if bilateral_variance is not None:
        out = out / norm
    return out
