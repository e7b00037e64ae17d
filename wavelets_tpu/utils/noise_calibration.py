"""On-device Monte-Carlo regeneration of the σ_e noise tables.

The reference estimates the per-scale std of the transform of unit
Gaussian noise with a serial tqdm loop on the host
(``watroo/wavelets.py:221-229``); this is how the hard-coded tables at
``watroo/wavelets.py:241-254, 270-283`` were produced.  Here the trials
run on device: batches of trials are vmapped through the jitted
decomposition and accumulated with a ``lax.scan``, so memory stays at
one batch of trial volumes regardless of ``n_trials``."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.transform import decompose, normalize_bilateral
from ..ops.filters import ScalingFunction

__all__ = ["compute_noise_weights"]


@partial(
    jax.jit,
    static_argnames=("sf", "n_dim", "n_scales", "n_trials", "batch",
                     "bilateral", "bilateral_scaling", "size"),
)
def _mc_sigma_e(
    key: jax.Array,
    sf: ScalingFunction,
    n_dim: int,
    n_scales: int,
    n_trials: int,
    batch: int,
    bilateral,
    bilateral_scaling: bool,
    size: int,
) -> jax.Array:
    shape = (batch,) + (size,) * n_dim
    spatial = tuple(range(2, n_dim + 2))  # std axes within plane stack
    axes = tuple(range(1, n_dim + 1))     # transform axes (skip batch)
    n_batches = n_trials // batch

    def body(acc, k):
        data = jax.random.normal(k, shape, dtype=jnp.float32)
        planes = decompose(
            data, n_scales, sf, axes=axes, bilateral=bilateral,
            bilateral_scaling=bilateral_scaling,
        )
        # planes: (n_scales+1, batch, *spatial); per-trial std of each
        # detail plane, summed over the batch (watroo/wavelets.py:227)
        stds = jnp.std(planes[:-1], axis=spatial)  # (n_scales, batch)
        return acc + jnp.sum(stds, axis=1), None

    keys = jax.random.split(key, n_batches)
    acc, _ = lax.scan(body, jnp.zeros((n_scales,), jnp.float32), keys)
    return acc / (n_batches * batch)


def compute_noise_weights(
    sf: ScalingFunction,
    n_dim: int,
    n_scales: int,
    n_trials: int = 100,
    bilateral=None,
    bilateral_scaling: bool = False,
    seed: int = 0,
    batch: int = None,
) -> np.ndarray:
    """Monte-Carlo σ_e estimate, semantics of
    ``AbstractScalingFunction.compute_noise_weights``
    (watroo/wavelets.py:221-229): mean over trials of the per-detail-plane
    std of transformed unit Gaussian noise, input extent
    ``len(sigma_e_1d)·2^n_scales`` per dimension."""
    table = sf.sigma_e(1, False)
    size = len(table) * 2 ** n_scales
    if batch is None:
        # keep one batch of volumes under ~256 MB
        per_trial = (size ** n_dim) * 4 * (n_scales + 2)
        batch = max(1, min(n_trials, (256 << 20) // max(per_trial, 1)))
    while n_trials % batch:
        batch -= 1
    bil = normalize_bilateral(bilateral, n_scales)
    key = jax.random.PRNGKey(seed)
    out = _mc_sigma_e(
        key, sf, n_dim, n_scales, n_trials, batch, bil,
        bilateral_scaling, size,
    )
    return np.asarray(out)
