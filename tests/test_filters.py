import numpy as np
import pytest

from wavelets_tpu import B3SPLINE, TRIANGLE, B3spline, Triangle
from wavelets_tpu.ops.filters import get_scaling_function


@pytest.mark.parametrize("spec", [TRIANGLE, B3SPLINE])
def test_taps_partition_of_unity(spec):
    assert np.isclose(sum(spec.taps), 1.0)
    assert spec.is_symmetric


@pytest.mark.parametrize("spec,hw", [(TRIANGLE, 1), (B3SPLINE, 2)])
def test_half_width_and_reach(spec, hw):
    assert spec.half_width == hw
    assert spec.reach(0) == hw
    assert spec.reach(3) == hw * 8
    assert spec.cumulative_reach(4) == hw * 15


@pytest.mark.parametrize("spec", [TRIANGLE, B3SPLINE])
@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_kernel_outer_product(spec, ndim):
    k = spec.kernel_nd(ndim)
    assert k.shape == (len(spec.taps),) * ndim
    assert np.isclose(k.sum(), 1.0)
    t = np.asarray(spec.taps)
    if ndim == 2:
        np.testing.assert_allclose(k, np.outer(t, t))


@pytest.mark.parametrize("spec", [TRIANGLE, B3SPLINE])
@pytest.mark.parametrize("scale", [0, 1, 3])
def test_atrous_kernel_embedding(spec, scale):
    k = spec.atrous_kernel_nd(2, scale)
    d = 2 ** scale
    n = len(spec.taps)
    assert k.shape == ((n - 1) * d + 1,) * 2
    np.testing.assert_allclose(k[::d, ::d], spec.kernel_nd(2))
    # holes are exactly zero
    mask = np.ones_like(k, dtype=bool)
    mask[::d, ::d] = False
    assert np.all(k[mask] == 0)


def test_sigma_e_tables_match_reference_lengths():
    assert len(B3SPLINE.sigma_e(2, False)) == 11
    # reference's 2-D bilateral B3spline table is one entry short
    # (watroo/wavelets.py:280-281)
    assert len(B3SPLINE.sigma_e(2, True)) == 10
    assert len(TRIANGLE.sigma_e(3, False)) == 5
    assert B3SPLINE.sigma_e(1, True) is None


def test_compat_class_surface():
    sf = B3spline(2)
    assert sf.n_dim == 2
    assert sf.kernel.shape == (5, 5)
    np.testing.assert_allclose(sf.coefficients_1d,
                               [1 / 16, 1 / 4, 3 / 8, 1 / 4, 1 / 16])
    assert sf.sigma_e()[0] == pytest.approx(0.8907)
    assert sf.sigma_e(bilateral=1)[0] == pytest.approx(0.38234752)
    assert Triangle(1).atrous_kernel(2).shape == (9,)
    with pytest.raises(ValueError):
        B3spline(4)


def test_get_scaling_function():
    assert get_scaling_function("b3spline") is B3SPLINE
    assert get_scaling_function("Triangle") is TRIANGLE
    with pytest.raises(ValueError):
        get_scaling_function("haar")


def test_module_path_compat():
    """watroo module-path parity: the reference's import paths resolve."""
    from wavelets_tpu.wavelets import (  # noqa: F401
        AtrousTransform,
        B3spline,
        Coefficients,
        convolution,
        generalized_anscombe,
    )
    from wavelets_tpu.utils import denoise, richardson_lucy, wow

    import wavelets_tpu as wt

    assert wow is wt.wow
    assert denoise is wt.denoise
    assert richardson_lucy is wt.richardson_lucy
    assert AtrousTransform is wt.AtrousTransform
