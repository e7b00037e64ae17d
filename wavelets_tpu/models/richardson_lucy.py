"""Multiresolution-supported Richardson-Lucy deconvolution
(reference: watroo/utils.py:222-290).

RL iterations with wavelet-domain regularization of the residual: each
iteration blurs the estimate with the PSF, à trous-transforms the
residual, masks it with the (persistent) multiresolution support, and
applies the multiplicative RL update.  The iteration loop is a
``lax.scan`` with ``(psi, mrs)`` as carry, so the whole deconvolution —
including one full wavelet transform per iteration — is a single compiled
program.  The PSF convolutions use either the XLA FFT path
(``jnp.fft.rfft2``) or a direct ``lax.conv`` with symmetric padding
(cv2 ``BORDER_REFLECT`` parity, watroo/utils.py:257)."""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..api import _as_device_array
from ..core.transform import decompose, synthesize
from ..ops.filters import B3SPLINE, ScalingFunction
from ..ops.layout import stack_planes
from ..ops.stats import mad_noise, significance

__all__ = ["richardson_lucy", "richardson_lucy_core"]


def _correlate2d_symmetric(x: jax.Array, psf: jax.Array) -> jax.Array:
    """2-D correlation with symmetric (edge-duplicated) boundary, matching
    ``cv2.filter2D(..., BORDER_REFLECT)`` (watroo/utils.py:257, :286).

    Note cv2.filter2D computes *correlation*; the reference flips the PSF
    for the forward blur and leaves it unflipped for the adjoint.

    Implemented as a shift-and-add over static tap offsets (the PSF
    values stay traced — runtime data): a single-channel
    ``lax.conv_general_dilated`` is MXU-degenerate on TPU (1/128 lane
    utilization; measured 5.9 ms per 5×5 conv at 1024² vs ~0.2 ms for
    the fused shift-add, which is pure VPU work XLA folds into one
    elementwise pass)."""
    ph, pw = psf.shape
    top, left = ph // 2, pw // 2
    bot, right = ph - 1 - top, pw - 1 - left
    xp = jnp.pad(x, ((top, bot), (left, right)), mode="symmetric")
    H, W = x.shape
    psf = psf.astype(x.dtype)
    out = jnp.zeros_like(x)
    for i in range(ph):
        for j in range(pw):
            out = out + psf[i, j] * lax.slice(xp, (i, j), (i + H, j + W))
    return out


def _fft_psf(psf: jax.Array, shape: Tuple[int, int]) -> jax.Array:
    """Centered, rolled PSF spectrum (watroo/utils.py:245-250)."""
    H, W = shape
    ph, pw = psf.shape
    padded = jnp.zeros(shape, psf.dtype)
    padded = lax.dynamic_update_slice(
        padded, psf, (H // 2 - ph // 2, W // 2 - pw // 2))
    return jnp.fft.rfft2(jnp.roll(padded, (H // 2, W // 2), axis=(0, 1)))


@partial(
    jax.jit,
    static_argnames=("iterations", "denoise_coefficients", "threshold_type",
                     "uniform_init", "persistent_mrs", "fft", "sf"),
)
def richardson_lucy_core(
    data: jax.Array,
    psf: jax.Array,
    *,
    iterations: int = 10,
    denoise_coefficients: Tuple[float, ...] = (5.0, 2.0, 1.0),
    threshold_type: str = "soft",
    uniform_init: bool = False,
    persistent_mrs: bool = True,
    fft: bool = False,
    sf: ScalingFunction = B3SPLINE,
) -> jax.Array:
    level = len(denoise_coefficients)
    soft = threshold_type == "soft"
    sigma_e = sf.sigma_e(data.ndim, False)

    # ---- initialization (watroo/utils.py:229-243) ----
    init_planes = decompose(data, level, sf)
    need_noise = any(d != 0 for d in denoise_coefficients)
    init_noise = mad_noise(init_planes[0], float(sigma_e[0]))

    if uniform_init:
        psi = jnp.full_like(data, jnp.sum(data) / data.size)
        # reference: coefficients.denoise never runs ⇒ noise stays unset
        # and is re-estimated from each iteration's residual
        has_init_noise = False
    else:
        masked = []
        for s in range(level + 1):
            c = init_planes[s]
            if s < level and denoise_coefficients[s] != 0:
                c = c * significance(
                    c, float(denoise_coefficients[s]), init_noise,
                    float(sigma_e[s]), soft)
            masked.append(c)
        psi = synthesize(stack_planes(masked))
        has_init_noise = need_noise

    mrs0 = (jnp.zeros((level,) + data.shape, data.dtype) if not soft
            else jnp.ones((level,) + data.shape, data.dtype))

    if fft:
        fft_psf = _fft_psf(psf.astype(data.dtype), data.shape)
        psf_conj = fft_psf.conj()
    else:
        psf_flipped = psf[::-1, ::-1].astype(data.dtype)

    # ---- RL iterations (watroo/utils.py:252-288) as a scan ----
    def step(carry, iteration):
        psi, mrs = carry
        if fft:
            phi = jnp.fft.irfft2(jnp.fft.rfft2(psi) * fft_psf,
                                 s=data.shape)
        else:
            phi = _correlate2d_symmetric(psi, psf_flipped)

        res = data - phi
        res_planes = decompose(res, level, sf)
        noise = (init_noise if has_init_noise
                 else mad_noise(res_planes[0], float(sigma_e[0])))

        new_mrs = []
        masked = []
        for s in range(level):
            sig = significance(
                res_planes[s], float(denoise_coefficients[s]), noise,
                float(sigma_e[s]), soft)
            if not soft:
                # hard: sticky support (watroo/utils.py:266-270)
                m = jnp.maximum(mrs[s], sig) if persistent_mrs else sig
                masked.append(res_planes[s] * m)
            else:
                # soft: multiplicative support with decaying exponent
                # (watroo/utils.py:272-276)
                m = mrs[s] * sig if persistent_mrs else sig
                expo = 1.0 / (iteration.astype(data.dtype) + 1.0)
                masked.append(res_planes[s] * (m ** expo))
            new_mrs.append(m)
        masked.append(res_planes[level])

        res = synthesize(stack_planes(masked))
        res = (res + phi) / phi

        if fft:
            conv = jnp.fft.irfft2(jnp.fft.rfft2(res) * psf_conj,
                                  s=data.shape)
        else:
            conv = _correlate2d_symmetric(res, psf.astype(data.dtype))

        return (psi * conv, stack_planes(new_mrs)), None

    (psi, _), _ = lax.scan(
        step, (psi, mrs0), jnp.arange(iterations), length=iterations)
    return psi


def richardson_lucy(data, psf, iterations=10,
                    denoise_coefficients=(5, 2, 1), threshold_type="soft",
                    uniform_init=False, persistent_mrs=True, fft=False):
    """Richardson-Lucy deconvolution with multiresolution support,
    signature-compatible with ``watroo.utils.richardson_lucy``
    (watroo/utils.py:222-290)."""
    data = _as_device_array(data)
    psf = _as_device_array(psf)
    return richardson_lucy_core(
        data, psf,
        iterations=int(iterations),
        denoise_coefficients=tuple(float(d) for d in denoise_coefficients),
        threshold_type=threshold_type,
        uniform_init=bool(uniform_init),
        persistent_mrs=bool(persistent_mrs),
        fft=bool(fft),
    )
