"""Property tests over randomized geometries: the transform invariants
must hold for any shape/level/filter combination, not just the tiled
fast-path shapes."""

import jax.numpy as jnp
import numpy as np
import pytest

import wavelets_tpu as wt
from wavelets_tpu.core.transform import decompose, synthesize
from wavelets_tpu.ops.filters import B3SPLINE, TRIANGLE

SHAPES_2D = [(33, 97), (64, 48), (129, 256), (100, 100)]


@pytest.mark.parametrize("shape", SHAPES_2D)
@pytest.mark.parametrize("spec", [TRIANGLE, B3SPLINE])
def test_round_trip_any_shape(rng, shape, spec):
    x = jnp.asarray(rng.normal(size=shape))
    planes = decompose(x, 3, spec)
    recon = np.asarray(synthesize(planes))
    assert np.abs(recon - np.asarray(x)).max() < 1e-12


@pytest.mark.parametrize("shape", SHAPES_2D)
def test_partition_of_unity_any_shape(shape):
    """Constant stays constant under smoothing at any geometry (kernel
    mass 1, symmetric boundary)."""
    x = jnp.full(shape, 2.5)
    planes = decompose(x, 3, B3SPLINE)
    arr = np.asarray(planes)
    np.testing.assert_allclose(arr[:-1], 0, atol=1e-12)
    np.testing.assert_allclose(arr[-1], 2.5, atol=1e-12)


@pytest.mark.parametrize("level", [1, 2, 5, 7])
def test_round_trip_levels(rng, level):
    x = jnp.asarray(rng.normal(size=(96, 80)))
    planes = decompose(x, level, B3SPLINE)
    assert planes.shape[0] == level + 1
    recon = np.asarray(synthesize(planes))
    assert np.abs(recon - np.asarray(x)).max() < 1e-12


def test_linearity(rng):
    """The transform is linear: T(ax + by) = aT(x) + bT(y)."""
    x = jnp.asarray(rng.normal(size=(64, 64)))
    y = jnp.asarray(rng.normal(size=(64, 64)))
    a, b = 2.5, -0.75
    lhs = np.asarray(decompose(a * x + b * y, 3, B3SPLINE))
    rhs = (a * np.asarray(decompose(x, 3, B3SPLINE))
           + b * np.asarray(decompose(y, 3, B3SPLINE)))
    np.testing.assert_allclose(lhs, rhs, atol=1e-11)


def test_shift_equivariance_interior(rng):
    """Interior coefficients shift with the image (à trous transforms are
    undecimated ⇒ translation-equivariant away from borders)."""
    x = np.asarray(rng.normal(size=(128, 128)))
    xs = np.roll(x, (4, 4), axis=(0, 1))
    p1 = np.asarray(decompose(jnp.asarray(x), 3, B3SPLINE))
    p2 = np.asarray(decompose(jnp.asarray(xs), 3, B3SPLINE))
    m = 40  # clear of boundary influence for 3 scales (reach 14) + shift
    np.testing.assert_allclose(
        np.roll(p1, (4, 4), axis=(1, 2))[:, m:-m, m:-m],
        p2[:, m:-m, m:-m], atol=1e-12)


def test_noise_shrinks_under_denoise(rng):
    """Denoising a pure-noise image must reduce its variance a lot while
    denoising a smooth image must roughly preserve it."""
    noise = rng.normal(size=(256, 256))
    # the erf soft mask attenuates (≈0.55σ residual); hard thresholding
    # removes outright (≈0.15σ)
    soft = np.asarray(wt.denoise(noise, [3] * 5))
    assert soft.std() < 0.65 * noise.std()
    hard = np.asarray(wt.denoise(noise, [3] * 5, soft_threshold=False))
    assert hard.std() < 0.25 * noise.std()

    yy, xx = np.mgrid[0:256, 0:256]
    smooth_img = np.sin(xx / 40.0) * np.cos(yy / 30.0) * 10
    out2 = np.asarray(wt.denoise(smooth_img + 0.1 * noise, [3, 3, 3]))
    assert abs(out2.std() - smooth_img.std()) / smooth_img.std() < 0.05


def test_wow_whitens_spectrum(rng):
    """WOW equalizes per-scale power: after whitening, detail-plane local
    power should be far more uniform across scales than before."""
    # strongly colored input: smooth large-scale structure
    yy, xx = np.mgrid[0:256, 0:256]
    img = (np.sin(xx / 50.0) * 40 + rng.normal(size=(256, 256))
           ).astype(np.float64)
    _, coeffs = wt.wow(img)
    planes = np.asarray(coeffs.data)
    stds = planes.std(axis=(1, 2))[:-1]
    before = np.asarray(wt.AtrousTransform()(img, len(stds)).data
                        ).std(axis=(1, 2))[:-1]
    assert (stds.max() / stds.min()) < 0.25 * (before.max() / before.min())
