"""Debug-mode numerical validation (SURVEY §5: the reference's only
guards are silent clamps; production wants loud failures on demand).

``checked(fn)`` wraps a jittable pipeline with
``jax.experimental.checkify`` float checks (NaN/Inf) so a debug run
raises with the failing operation instead of silently propagating
non-finite values."""

from __future__ import annotations

import functools
from typing import Callable

import jax
from jax.experimental import checkify

__all__ = ["checked", "assert_finite"]


def checked(fn: Callable) -> Callable:
    """Wrap ``fn`` so NaN/Inf produced anywhere inside raises
    ``checkify.JaxRuntimeError`` (debug tool — adds checking overhead)."""
    cfn = checkify.checkify(fn, errors=checkify.float_checks)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        err, out = cfn(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper


def assert_finite(x, name: str = "array") -> None:
    """Eager finiteness check for host-side debugging."""
    import numpy as np

    arr = np.asarray(x)
    if not np.isfinite(arr).all():
        n_bad = int((~np.isfinite(arr)).sum())
        raise FloatingPointError(
            f"{name}: {n_bad}/{arr.size} non-finite values")
