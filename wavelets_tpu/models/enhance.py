"""Per-channel denoise/enhance pipeline (reference: watroo/utils.py:10-80).

``prepare_params`` normalizes scalar/list/None per-channel parameter
specs to nested lists; ``enhance`` runs the denoise+weight pipeline on
one image (or per channel along axis 0 for 3-D input).  Kept for parity
although unexported by the reference's ``__all__`` (watroo/utils.py:7).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..api import AtrousTransform
from ..ops.layout import stack_planes

__all__ = ["enhance", "prepare_params"]


def prepare_params(param, ndims):
    """Normalize a per-channel parameter spec to a list (2-D) or a list of
    per-channel lists (3-D) — output contract of watroo/utils.py:10-33.

    2-D: ``None`` → ``[]``, a scalar → ``[scalar]``, a list is copied.
    3-D: a non-list is broadcast to every channel; a list must have one
    entry per channel, each normalized recursively (``None`` → ``[]``).
    """
    if ndims == 2:
        if param is None:
            return []
        return list(param) if isinstance(param, list) else [param]
    if not isinstance(param, list):
        return [prepare_params(param, 2) for _ in range(ndims)]
    if len(param) != ndims:
        raise ValueError("Invalid number of parameters")
    return [prepare_params(p, 2) for p in param]


def enhance(*args, weights=None, denoise=None, soft_threshold=True, out=None,
            **kwargs):
    """De-noising and/or enhancement by modification of wavelet
    coefficients (reference semantics: watroo/utils.py:36-80).

    ``args[0]`` is the image (2-D, or 3-D with channels on axis 0);
    optional ``args[1]`` supplies a (per-channel for 3-D) noise level.
    Extra keyword arguments are forwarded to :class:`AtrousTransform`.
    """
    img = args[0]
    noise = args[1] if len(args) == 2 else None
    weights = prepare_params(weights, img.ndim)
    denoise = prepare_params(denoise, img.ndim)
    atrous = AtrousTransform(**kwargs)

    def one_channel(channel, wgt, dns, channel_noise):
        # pad the shorter of (weights, denoise) so both cover the same
        # scale count: missing weights default to 1, missing denoise to 0
        wgt = list(wgt) + [1] * (len(dns) - len(wgt))
        dns = list(dns) + [0] * (len(wgt) - len(dns))
        coeffs = atrous(channel, len(wgt))
        coeffs.noise = (coeffs.get_noise() if channel_noise is None
                        else channel_noise)
        coeffs.denoise(dns, weights=wgt, soft_threshold=soft_threshold)
        return jnp.sum(coeffs.data, axis=0)

    if img.ndim == 3:
        result = stack_planes([
            one_channel(img[c], weights[c], denoise[c],
                        None if noise is None else noise[c])
            for c in range(3)])
    else:
        result = one_channel(img, weights, denoise, noise)

    if out is not None:
        out[...] = np.asarray(result)
        return out
    return result
