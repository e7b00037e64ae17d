import numpy as np
import pytest
import scipy.ndimage

from wavelets_tpu import B3SPLINE, TRIANGLE
from wavelets_tpu.ops.conv import (
    atrous_conv_nd,
    separable_smooth_axis,
    smooth,
    local_variance,
)


@pytest.mark.parametrize("spec", [TRIANGLE, B3SPLINE])
@pytest.mark.parametrize("scale", [0, 1, 2])
def test_smooth_1d_matches_scipy_mirror(data_1d, spec, scale):
    """1-D path parity: scipy.ndimage.convolve mode='mirror'
    (watroo/wavelets.py:66-69)."""
    kernel = spec.atrous_kernel_nd(1, scale)
    ref = scipy.ndimage.convolve(data_1d, kernel, mode="mirror")
    got = np.asarray(smooth(data_1d, spec, scale))
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("spec", [TRIANGLE, B3SPLINE])
@pytest.mark.parametrize("scale", [0, 1, 3])
def test_smooth_2d_matches_dense_symmetric(data_2d, spec, scale):
    """2-D separable passes ≡ dense dilated kernel with symmetric pad
    (cv2 BORDER_REFLECT parity, watroo/wavelets.py:39-45)."""
    kernel = spec.atrous_kernel_nd(2, scale)
    hw = (kernel.shape[0] - 1) // 2
    padded = np.pad(data_2d, hw, mode="symmetric")
    ref = scipy.ndimage.convolve(padded, kernel, mode="constant")[
        hw:-hw, hw:-hw]
    got = np.asarray(smooth(data_2d, spec, scale))
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


def test_smooth_3d_separable(data_3d):
    """3-D ≡ per-plane 2-D filter + axial 1-D filter
    (watroo/wavelets.py:47-64)."""
    spec = B3SPLINE
    k2 = spec.atrous_kernel_nd(2, 1)
    k1 = spec.atrous_kernel_nd(1, 1)
    hw = (k2.shape[0] - 1) // 2
    ref = np.empty_like(data_3d)
    for i in range(data_3d.shape[0]):
        p = np.pad(data_3d[i], hw, mode="symmetric")
        ref[i] = scipy.ndimage.convolve(p, k2, mode="constant")[
            hw:-hw, hw:-hw]
    for i in range(ref.shape[1]):
        for j in range(ref.shape[2]):
            p = np.pad(ref[:, i, j], hw, mode="symmetric")
            ref[:, i, j] = scipy.ndimage.convolve(p, k1, mode="constant")[
                hw:-hw]
    got = np.asarray(smooth(data_3d, spec, 1))
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)


def test_batched_axes(data_2d):
    """axes=(1,2) smooths each frame of a stack independently."""
    stack = np.stack([data_2d, data_2d * 2 + 1])
    got = np.asarray(smooth(stack, B3SPLINE, 1, axes=(1, 2)))
    single0 = np.asarray(smooth(data_2d, B3SPLINE, 1))
    single1 = np.asarray(smooth(data_2d * 2 + 1, B3SPLINE, 1))
    np.testing.assert_allclose(got[0], single0, rtol=1e-12)
    np.testing.assert_allclose(got[1], single1, rtol=1e-12)


def test_separable_axis_mass_conservation(data_2d):
    out = np.asarray(
        separable_smooth_axis(data_2d, B3SPLINE.taps, 2, 0, "symmetric"))
    # a smoothing filter preserves the mean of a periodic-free signal only
    # approximately; check exactly on a constant
    const = np.full((32, 32), 3.25)
    out = np.asarray(separable_smooth_axis(const, B3SPLINE.taps, 1, 1,
                                           "symmetric"))
    np.testing.assert_allclose(out, const, rtol=1e-14)


def test_atrous_conv_nd_matches_separable(data_2d):
    """The dense-kernel à trous path agrees with the separable path for a
    separable kernel."""
    for scale in (0, 2):
        dense = np.asarray(
            atrous_conv_nd(data_2d, B3SPLINE.kernel_nd(2), scale))
        sep = np.asarray(smooth(data_2d, B3SPLINE, scale))
        np.testing.assert_allclose(dense, sep, rtol=1e-12, atol=1e-12)


def test_local_variance_positive(data_2d):
    v = np.asarray(local_variance(data_2d, B3SPLINE, 1))
    assert (v > 0).all()
    # constant input → clamp floor
    v0 = np.asarray(local_variance(np.ones((32, 32)), B3SPLINE, 0))
    np.testing.assert_allclose(v0, 1e-20)
