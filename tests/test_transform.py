import jax.numpy as jnp
import numpy as np
import pytest

from wavelets_tpu import AtrousTransform, B3spline, Coefficients, Triangle
from wavelets_tpu.core.transform import decompose, synthesize


@pytest.mark.parametrize("cls", [Triangle, B3spline])
@pytest.mark.parametrize("level", [1, 4, 6])
def test_round_trip_exact(data_2d, cls, level):
    """Lossless synthesis: sum of planes reproduces the input to machine
    eps (SURVEY §2.4: 8.9e-16 f64)."""
    coeffs = AtrousTransform(cls)(data_2d, level)
    recon = np.sum(np.asarray(coeffs), axis=0)
    assert np.abs(recon - data_2d).max() < 1e-13


def test_round_trip_f32(data_2d_f32):
    coeffs = AtrousTransform()(data_2d_f32, 6)
    recon = np.sum(np.asarray(coeffs), axis=0)
    assert recon.dtype == np.float32
    assert np.abs(recon - data_2d_f32).max() < 5e-6


@pytest.mark.parametrize("cls", [Triangle, B3spline])
def test_constant_image_partition_of_unity(cls):
    """Reference test_regular (tests/test_wavelets.py:8-13): transform of a
    constant image ⇒ detail planes ≈ 0, residual ≈ 1."""
    data = np.ones((128, 128))
    coeffs = AtrousTransform(cls)(data, 4)
    arr = np.asarray(coeffs)
    assert arr.shape == (5, 128, 128)
    np.testing.assert_allclose(arr[:-1], 0, atol=1e-13)
    np.testing.assert_allclose(arr[-1], 1, atol=1e-13)


def test_standard_vs_recursive_interior(data_2d):
    """Standard and recursive-border modes agree in the interior
    (SURVEY §2.4: max diff ~1e-16 at ≥16 px margin, 4 scales)."""
    t = AtrousTransform()
    std = np.asarray(t(data_2d, 4, recursive=False))
    rec = np.asarray(t(data_2d, 4, recursive=True))
    m = 16
    np.testing.assert_allclose(
        std[:, m:-m, m:-m], rec[:, m:-m, m:-m], atol=1e-12)


def test_dtype_recast_rules():
    """int → widest float (watroo/wavelets.py:297, :319-320)."""
    t = AtrousTransform()
    out = t(np.arange(64 * 64, dtype=np.int32).reshape(64, 64), 2)
    assert np.asarray(out).dtype == np.float64
    out = t(np.ones((64, 64), dtype=">f4"), 2)
    assert np.asarray(out).dtype == np.float64
    out = t(np.ones((64, 64), dtype=np.float32), 2)
    assert np.asarray(out).dtype == np.float32


def test_ndim_guard():
    with pytest.raises(ValueError):
        AtrousTransform()(np.ones((2, 2, 2, 2)), 1)


def test_1d_transform_round_trip(data_1d):
    coeffs = AtrousTransform()(data_1d, 3)
    assert len(coeffs) == 4
    recon = np.sum(np.asarray(coeffs), axis=0)
    assert np.abs(recon - data_1d).max() < 1e-13


def test_3d_transform_round_trip(data_3d):
    coeffs = AtrousTransform(Triangle)(data_3d, 2)
    recon = np.sum(np.asarray(coeffs), axis=0)
    assert np.abs(recon - data_3d).max() < 1e-13


def test_bilateral_round_trip(data_2d):
    """Bilateral decomposition is also exactly invertible (differences
    telescope regardless of the smoothing operator)."""
    t = AtrousTransform(B3spline, bilateral=1)
    coeffs = t(data_2d, 3)
    recon = np.sum(np.asarray(coeffs), axis=0)
    assert np.abs(recon - data_2d).max() < 1e-13


def test_batched_decompose(data_2d):
    stack = jnp.stack([jnp.asarray(data_2d)] * 3)
    planes = decompose(stack, 4, B3spline(2).spec, axes=(1, 2))
    assert planes.shape == (5, 3, 128, 128)
    single = decompose(jnp.asarray(data_2d), 4, B3spline(2).spec)
    np.testing.assert_allclose(np.asarray(planes[:, 1]), np.asarray(single),
                               rtol=1e-12)
    recon = np.asarray(synthesize(planes))
    np.testing.assert_allclose(recon, np.asarray(stack), atol=1e-13)


def test_coefficients_noise_estimator(rng):
    """Unit Gaussian image → get_noise() ≈ 1 (SURVEY §2.4: 0.9990)."""
    data = rng.normal(size=(512, 512))
    coeffs = AtrousTransform()(data, 2)
    noise = float(coeffs.get_noise())
    assert abs(noise - 1.0) < 0.02


def test_significance_modes(rng):
    data = rng.normal(size=(128, 128))
    coeffs = AtrousTransform()(data, 3)
    soft = np.asarray(coeffs.significance(3, 0, soft_threshold=True))
    assert soft.min() >= 0 and soft.max() <= 1
    hard = np.asarray(coeffs.significance(3, 0, soft_threshold=False))
    assert set(np.unique(hard)).issubset({0.0, 1.0})
    ones = np.asarray(coeffs.significance(0, 0))
    np.testing.assert_allclose(ones, 1)


def test_denoise_residual_untouched(rng):
    """zip truncation: residual plane unmodified when len(sigma)==level
    (watroo/wavelets.py:148)."""
    data = rng.normal(size=(128, 128))
    coeffs = AtrousTransform()(data, 2)
    before = np.asarray(coeffs.data[-1]).copy()
    coeffs.denoise([3, 3])
    np.testing.assert_array_equal(np.asarray(coeffs.data[-1]), before)
    # detail planes shrink
    assert np.abs(np.asarray(coeffs.data[0])).sum() < np.abs(data).sum()


def test_coefficients_len_and_array(data_2d):
    coeffs = AtrousTransform()(data_2d, 3)
    assert len(coeffs) == 4
    assert isinstance(coeffs, Coefficients)
    arr = np.asarray(coeffs)
    assert arr.shape == (4, 128, 128)


def test_bfloat16_round_trip(rng):
    """bf16 inputs flow through the (dtype-preserving) XLA path."""
    x = jnp.asarray(rng.normal(size=(128, 128)), dtype=jnp.bfloat16)
    coeffs = AtrousTransform()(x, 3)
    assert coeffs.data.dtype == jnp.bfloat16
    recon = jnp.sum(coeffs.data, axis=0).astype(jnp.float32)
    err = np.abs(np.asarray(recon) - np.asarray(x.astype(jnp.float32)))
    assert err.max() < 0.05  # bf16 precision


def test_bfloat16_wow(rng):
    """bf16 WOW matches f32 within bf16 precision (~0.6% rel) — the
    high-throughput serving mode (2× HBM bandwidth)."""
    import wavelets_tpu as wt

    x = rng.normal(size=(256, 256)).astype(np.float32)
    rf, _ = wt.wow(jnp.asarray(x), denoise_coefficients=[5, 2], noise=1.0)
    rb, _ = wt.wow(jnp.asarray(x, dtype=jnp.bfloat16),
                   denoise_coefficients=[5, 2], noise=1.0)
    rel = np.abs(np.asarray(rb.astype(jnp.float32)) - np.asarray(rf))
    assert rel.max() / np.abs(np.asarray(rf)).max() < 0.03
