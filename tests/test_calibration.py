"""On-device Monte-Carlo σ_e calibration reproduces the reference tables
(SURVEY §2.4: 3-trial run matches within a few percent)."""

import numpy as np
import pytest

from wavelets_tpu import B3spline, Triangle


def test_noise_weights_match_table_2d():
    got = B3spline(2).compute_noise_weights(4, n_trials=8, seed=0)
    table = B3spline(2).sigma_e()[:4]
    np.testing.assert_allclose(got, table, rtol=0.08)


def test_noise_weights_match_table_1d():
    got = Triangle(1).compute_noise_weights(4, n_trials=16, seed=1)
    table = Triangle(1).sigma_e()[:4]
    np.testing.assert_allclose(got, table, rtol=0.12)


def test_noise_weights_bilateral():
    got = B3spline(2).compute_noise_weights(3, n_trials=2, bilateral=1,
                                            seed=2)
    table = B3spline(2).sigma_e(bilateral=1)[:3]
    assert got.shape == (3,)
    # bilateral MC is noisier; low trial count → loose check
    np.testing.assert_allclose(got, table, rtol=0.3)
