"""Plane-cube assembly tuned for the TPU backend.

``jnp.stack`` lowers to ``expand_dims`` (``broadcast_in_dim``) +
``concatenate``; on this backend that pattern executes at 2-60 GB/s on
4k² planes (measured: ``jnp.stack`` of 11 planes 24.6 ms, concat of
``p[None]`` 945 ms).  The *same* concatenate over ``reshape``d operands
streams at 400-660 GB/s (2.2-3.5 ms).  Every hot-path cube assembly in
the package goes through :func:`stack_planes`, which is semantically
``jnp.stack(rows, axis=0)``.

Reproduce with ``python scripts/perf_probe.py stack`` (``probe_stack``).
"""

from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = ["stack_planes"]


def stack_planes(rows: Sequence[jax.Array]) -> jax.Array:
    """``jnp.stack(rows, axis=0)`` via reshape + concatenate (fast on
    TPU, identical elements/layout)."""
    rows = list(rows)
    if len(rows) == 1:
        r = rows[0]
        return r.reshape((1,) + r.shape)
    return jnp.concatenate(
        [r.reshape((1,) + r.shape) for r in rows], axis=0)
