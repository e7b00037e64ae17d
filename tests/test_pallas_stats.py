"""Exact-median Pallas kernel (interpret mode) vs numpy."""

import jax.numpy as jnp
import numpy as np
import pytest

from wavelets_tpu.ops.stats import _median_nonneg_bisect, _median_nonneg_pallas


@pytest.mark.parametrize("n", [1024, 2048, 3072, 262144])
@pytest.mark.parametrize("scale", [1.0, 1e-18, 1e18])
def test_median_pallas_exact(rng, n, scale):
    a = jnp.abs(jnp.asarray((rng.normal(size=(n,)) * scale)
                            .astype(np.float32)))
    got = float(_median_nonneg_pallas(a))
    assert got == float(np.median(np.asarray(a)))


def test_median_pallas_duplicates():
    a = jnp.asarray(np.repeat([1.0, 2.0], 512).astype(np.float32))
    assert float(_median_nonneg_pallas(a)) == 1.5
    a = jnp.asarray(np.full(2048, 3.25, np.float32))
    assert float(_median_nonneg_pallas(a)) == 3.25
    a = jnp.asarray(np.zeros(1024, np.float32))
    assert float(_median_nonneg_pallas(a)) == 0.0


@pytest.mark.parametrize("n", [5, 100, 1001])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_median_bisect_exact(rng, n, dtype):
    a = jnp.abs(jnp.asarray(rng.normal(size=(n,)).astype(dtype)))
    assert float(_median_nonneg_bisect(a)) == float(
        np.median(np.asarray(a)))


def test_erf_approximation_accuracy():
    """The in-kernel A&S 7.1.26 erf must stay within 2e-7 of the true
    erf over the useful range (it feeds the significance mask)."""
    import jax.numpy as jnp
    import scipy.special

    from wavelets_tpu.ops.pallas_wow import _erf_pos

    x = np.linspace(0.0, 6.0, 20001).astype(np.float64)
    got = np.asarray(_erf_pos(jnp.asarray(x)))
    ref = scipy.special.erf(x)
    assert np.abs(got - ref).max() < 2e-7
