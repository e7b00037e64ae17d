"""Per-channel denoise/enhance pipeline (reference: watroo/utils.py:10-80).

``prepare_params`` normalizes scalar/list/None per-channel parameter specs;
``enhance`` runs the denoise+weight pipeline per channel (axis 0 for 3-D
input).  Kept for parity although unexported by the reference's
``__all__`` (watroo/utils.py:7)."""

from __future__ import annotations

import copy

import jax.numpy as jnp
import numpy as np

from ..api import AtrousTransform

__all__ = ["enhance", "prepare_params"]


def prepare_params(param, ndims):
    """Normalize per-channel parameter specs (watroo/utils.py:10-33)."""
    if ndims == 2:
        if param is None:
            l = []
        elif type(param) is not list:
            l = [param]
        else:
            l = copy.copy(param)
    else:
        if type(param) is not list:
            if param is None:
                l = [[], ] * ndims
            else:
                l = [[param], ] * ndims
        else:
            if len(param) != ndims:
                raise ValueError("Invalid number of parameters")
            l = [prepare_params(p, 2) for p in param]
            if None in l:
                l[l.index(None)] = []
    return l


def enhance(*args, weights=None, denoise=None, soft_threshold=True, out=None,
            **kwargs):
    """De-noising and/or enhancement by modification of wavelet
    coefficients (watroo/utils.py:36-80).

    ``args[0]`` is the image (2-D, or 3-D with channels on axis 0);
    optional ``args[1]`` supplies a per-channel noise level.  Extra
    keyword arguments are forwarded to :class:`AtrousTransform`.
    """
    img = args[0]
    channels = [0, 1, 2] if img.ndim == 3 else [Ellipsis]

    weights = prepare_params(weights, img.ndim)
    denoise = prepare_params(denoise, img.ndim)

    atrous = AtrousTransform(**kwargs)
    results = {}
    for c in channels:
        dns = list(denoise if c is Ellipsis else denoise[c])
        wgt = list(weights if c is Ellipsis else weights[c])
        if len(wgt) < len(dns):
            wgt.extend([1] * (len(dns) - len(wgt)))
        elif len(dns) < len(wgt):
            dns.extend([0] * (len(wgt) - len(dns)))

        coeffs = atrous(img[c], len(wgt))
        if len(args) == 2:
            coeffs.noise = args[1] if c is Ellipsis else args[1][c]
        else:
            coeffs.noise = coeffs.get_noise()
        coeffs.denoise(dns, weights=wgt, soft_threshold=soft_threshold)
        results[c] = jnp.sum(coeffs.data, axis=0)

    if img.ndim == 3:
        result = jnp.stack([results[c] for c in channels])
    else:
        result = results[Ellipsis]
    if out is not None:
        out[...] = np.asarray(result)
        return out
    return result
