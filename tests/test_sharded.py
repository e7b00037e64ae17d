"""Sharded == single-device equality on a forced 8-device CPU mesh
(SURVEY §4: multi-host tests via xla_force_host_platform_device_count)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavelets_tpu import B3SPLINE, TRIANGLE, wow
from wavelets_tpu.core.transform import decompose
from wavelets_tpu.parallel import make_mesh, sharded_decompose, sharded_wow
from wavelets_tpu.parallel.reductions import (
    distributed_median,
    distributed_std,
    kth_smallest,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


@pytest.fixture
def mesh22():
    return make_mesh(data=1, rows=2, cols=2, devices=jax.devices()[:4])


@pytest.fixture
def mesh42():
    return make_mesh(data=1, rows=4, cols=2)


@pytest.fixture
def mesh_batched():
    return make_mesh(data=2, rows=2, cols=2)


@pytest.mark.parametrize("spec", [TRIANGLE, B3SPLINE])
@pytest.mark.parametrize("level", [2, 4])
def test_sharded_decompose_bitwise(rng, mesh22, spec, level):
    img = jnp.asarray(rng.normal(size=(128, 128)))
    ref = decompose(img, level, spec)
    got = sharded_decompose(img, level, spec, mesh22)
    assert got.shape == ref.shape
    # bitwise: identical accumulation order per element
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_sharded_decompose_deep_scale_fallback(rng, mesh42):
    """Reach hw·2^s exceeds the local tile → all_gather fallback path."""
    img = jnp.asarray(rng.normal(size=(64, 64)))  # local rows = 16
    # B3spline s=3 → reach 16; s=4 → 32 > 16 local rows
    ref = decompose(img, 5, B3SPLINE)
    got = sharded_decompose(img, 5, B3SPLINE, mesh42)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-12, atol=1e-13)


def test_sharded_decompose_batched(rng, mesh_batched):
    stack = jnp.asarray(rng.normal(size=(4, 64, 64)))
    ref = decompose(stack, 3, B3SPLINE, axes=(1, 2))
    got = sharded_decompose(stack, 3, B3SPLINE, mesh_batched)
    # same arithmetic per element, but XLA may contract FMAs differently
    # for the batched program shape — near-machine-eps, not bitwise
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-13, atol=1e-14)


def test_sharded_bilateral_decompose(rng, mesh22):
    img = jnp.asarray(rng.normal(size=(128, 128)))
    ref = decompose(img, 2, B3SPLINE, bilateral=(1.0, 1.0, 1.0))
    got = sharded_decompose(img, 2, B3SPLINE, mesh22,
                            bilateral=(1.0, 1.0, 1.0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-10, atol=1e-12)


def test_distributed_reductions(rng, mesh22):
    from functools import partial

    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jnp.asarray(np.abs(rng.normal(size=(64, 64))))

    def local(a):
        med = distributed_median(a, ("rows", "cols"), 64 * 64)
        std = distributed_std(a, ("rows", "cols"), 64 * 64)
        return med, std

    fn = shard_map(local, mesh=mesh22,
                   in_specs=(P("rows", "cols"),),
                   out_specs=(P(), P()))
    med, std = jax.jit(fn)(jax.device_put(
        x, NamedSharding(mesh22, P("rows", "cols"))))
    assert float(med) == float(jnp.median(x))  # exact
    assert float(std) == pytest.approx(float(jnp.std(x)), rel=1e-12)


def test_kth_smallest_exact(rng, mesh22):
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jnp.asarray(np.abs(rng.normal(size=(32, 32))))
    k = 317

    fn = shard_map(
        lambda a: kth_smallest(a, k, ("rows", "cols")),
        mesh=mesh22, in_specs=(P("rows", "cols"),), out_specs=P())
    got = jax.jit(fn)(jax.device_put(
        x, NamedSharding(mesh22, P("rows", "cols"))))
    ref = np.sort(np.asarray(x).ravel())[k]
    assert float(got) == float(ref)


class TestShardedWow:
    def test_plain(self, rng, mesh22):
        img = jnp.asarray(rng.normal(size=(128, 128)))
        ref, _ = wow(img)
        got, _ = sharded_wow(img, mesh22)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-11, atol=1e-12)

    def test_denoise_gamma(self, rng, mesh22):
        img = jnp.asarray(rng.normal(size=(128, 128)))
        ref, ref_c = wow(img, denoise_coefficients=[5, 2], h=0.5,
                         weights=[1.1, 0.9])
        got, got_p = sharded_wow(img, mesh22, denoise_coefficients=[5, 2],
                                 h=0.5, weights=[1.1, 0.9])
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-11, atol=1e-12)
        np.testing.assert_allclose(np.asarray(got_p),
                                   np.asarray(ref_c.data),
                                   rtol=1e-11, atol=1e-12)

    def test_preserve_variance(self, rng, mesh22):
        img = jnp.asarray(rng.normal(size=(128, 128)))
        ref, _ = wow(img, preserve_variance=True)
        got, _ = sharded_wow(img, mesh22, preserve_variance=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-11, atol=1e-12)

    def test_bilateral(self, rng, mesh22):
        img = jnp.asarray(rng.normal(size=(128, 128)))
        ref, _ = wow(img, bilateral=1, denoise_coefficients=[5, 2])
        got, _ = sharded_wow(img, mesh22, bilateral=1,
                             denoise_coefficients=[5, 2])
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-9, atol=1e-10)

    def test_batched_per_frame_stats(self, rng, mesh_batched):
        """Frame stack over the data axis: statistics stay per-frame."""
        stack = jnp.asarray(rng.normal(size=(4, 64, 64)) *
                            np.array([1, 2, 3, 4])[:, None, None])
        refs = [np.asarray(wow(stack[i], denoise_coefficients=[5, 2])[0])
                for i in range(4)]
        got, _ = sharded_wow(stack, mesh_batched,
                             denoise_coefficients=[5, 2])
        got = np.asarray(got)
        for i in range(4):
            np.testing.assert_allclose(got[i], refs[i], rtol=1e-11,
                                       atol=1e-12)


@pytest.mark.parametrize("rows,cols", [(4, 1), (1, 4), (8, 1)])
def test_sharded_decompose_1d_meshes(rng, rows, cols):
    """Single-axis spatial meshes (rows-only / cols-only tilings)."""
    mesh = make_mesh(data=1, rows=rows, cols=cols,
                     devices=jax.devices()[:rows * cols])
    img = jnp.asarray(rng.normal(size=(128, 128)))
    ref = decompose(img, 3, B3SPLINE)
    got = sharded_decompose(img, 3, B3SPLINE, mesh)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_sharded_wow_hard_threshold(rng, mesh22):
    img = jnp.asarray(rng.normal(size=(128, 128)))
    ref, _ = wow(img, denoise_coefficients=[4, 2], soft_threshold=False)
    got, _ = sharded_wow(img, mesh22, denoise_coefficients=[4, 2],
                         soft_threshold=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-11, atol=1e-12)


def test_sharded_bilateral_deep_scale_fallback(rng, mesh42):
    """Bilateral reach beyond the local tile → all_gather fallback."""
    img = jnp.asarray(rng.normal(size=(64, 64)))  # local tiles 16x32
    bil = (1.0,) * 6
    ref = decompose(img, 5, B3SPLINE, bilateral=bil)
    got = sharded_decompose(img, 5, B3SPLINE, mesh42, bilateral=bil)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-9, atol=1e-11)


def test_sharded_wow_no_coefficients(rng, mesh22):
    """with_coefficients=False: same recon, planes elided."""
    img = jnp.asarray(rng.normal(size=(256, 256)).astype(np.float32))
    r1, planes = sharded_wow(img, mesh22,
                             denoise_coefficients=[5, 2], noise=1.0)
    r2, none = sharded_wow(img, mesh22,
                           denoise_coefficients=[5, 2], noise=1.0,
                           with_coefficients=False)
    assert none is None
    # the plane-free program is a different XLA optimization unit, so
    # equality is to f32 fusion tolerance
    d = np.abs(np.asarray(r1) - np.asarray(r2)).max()
    assert d < 1e-5, d
