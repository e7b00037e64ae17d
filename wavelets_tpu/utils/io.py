"""Coefficient persistence for pipeline reuse.

The reference's only cross-call state is the ``Coefficients`` object that
``wow`` returns and accepts back (watroo/utils.py:128-131, 152-153).
Coefficients here are a plain array + static metadata, so persistence is
a small npz file."""

from __future__ import annotations

import numpy as np

from ..api import B3spline, Coefficients, Triangle
from ..ops.filters import get_scaling_function

__all__ = ["save_coefficients", "load_coefficients"]

_COMPAT = {"triangle": Triangle, "b3spline": B3spline}


def save_coefficients(path: str, coefficients: Coefficients) -> None:
    np.savez_compressed(
        path,
        data=np.asarray(coefficients.data),
        scaling_function=coefficients.scaling_function.name,
        n_dim=coefficients.scaling_function.n_dim,
        bilateral=np.asarray(
            [] if coefficients.bilateral is None
            else np.atleast_1d(coefficients.bilateral), dtype=np.float64),
        noise=np.asarray(
            np.nan if coefficients.noise is None else coefficients.noise),
    )


def load_coefficients(path: str) -> Coefficients:
    with np.load(path, allow_pickle=False) as f:
        name = str(f["scaling_function"])
        n_dim = int(f["n_dim"])
        bilateral = f["bilateral"]
        bilateral = None if bilateral.size == 0 else list(bilateral)
        if bilateral is not None and len(bilateral) == 1:
            bilateral = bilateral[0]
        coeffs = Coefficients(f["data"], _COMPAT[name](n_dim), bilateral)
        noise = f["noise"]
        if not np.isnan(noise).all():
            coeffs.noise = noise if noise.ndim else float(noise)
    return coeffs
