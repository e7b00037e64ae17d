"""Wavelet denoising pipeline (reference: ``denoise``, watroo/utils.py:83-102).

``denoise_core`` is the jitted functional pipeline — decomposition,
MAD noise estimation, erf/hard significance thresholding, synthesis, and
optional Anscombe stabilization all compile into ONE XLA program, so the
whole thing is a single device dispatch (vs the reference's per-scale
Python→C++ round trips)."""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..api import B3spline, _as_device_array, _spec_of
from ..core.transform import decompose, normalize_bilateral, synthesize
from ..ops.filters import ScalingFunction
from ..ops.stats import apply_denoise, generalized_anscombe, mad_noise

__all__ = ["denoise", "denoise_core"]


@partial(
    jax.jit,
    static_argnames=("weights", "sf", "bilateral", "soft_threshold",
                     "anscombe", "axes", "has_noise"),
)
def denoise_core(
    data: jax.Array,
    noise: Optional[jax.Array],
    weights: Tuple[float, ...],
    sf: ScalingFunction,
    bilateral: Optional[Tuple[float, ...]] = None,
    soft_threshold: bool = True,
    anscombe: bool = False,
    axes: Optional[Tuple[int, ...]] = None,
    has_noise: bool = False,
) -> jax.Array:
    """Fused denoise pipeline.  ``weights`` static; ``noise=None`` (with
    ``has_noise=False``) estimates it on-device via MAD."""
    if anscombe:
        data = generalized_anscombe(data)
    level = len(weights)
    planes = decompose(data, level, sf, axes=axes, bilateral=bilateral)
    sigma_e = sf.sigma_e(
        len(axes) if axes is not None else data.ndim,
        bilateral is not None,
    )
    if not has_noise:
        noise = mad_noise(planes[0], float(sigma_e[0]))
    out_planes = apply_denoise(
        planes, weights, (1.0,) * level,
        tuple(float(v) for v in sigma_e[:level]),
        noise, soft_threshold,
    )
    out = synthesize(out_planes)
    if anscombe:
        out = generalized_anscombe(out, inverse=True)
    return out


def denoise(data, weights, scaling_function=B3spline, noise=None,
            bilateral=None, soft_threshold=True, anscombe=False):
    """Convenience denoise, signature-compatible with watroo/utils.py:83-102.

    :param data: array-like, the data to denoise
    :param weights: per-scale significance thresholds (σ multiples); the
        number of scales is ``len(weights)``
    :param scaling_function: scaling function (class, instance, or spec)
    :param noise: known noise level (scalar or array); ``None`` → MAD
    :param bilateral: per-scale bilateral σ (scalar or list) or ``None``
    :param soft_threshold: erf-based soft masking vs hard thresholding
    :param anscombe: apply the generalized Anscombe transform around the
        pipeline
    :return: the denoised data (device array)
    """
    data = _as_device_array(data)
    spec = _spec_of(scaling_function)
    weights = tuple(float(w) for w in weights)
    bil = normalize_bilateral(bilateral, len(weights))
    has_noise = noise is not None
    noise_arr = jnp.asarray(noise, data.dtype) if has_noise else jnp.zeros(
        (), data.dtype)
    return denoise_core(
        data, noise_arr, weights, spec, bilateral=bil,
        soft_threshold=soft_threshold, anscombe=anscombe,
        has_noise=has_noise,
    )
