"""Round-4 sharded fast paths: the mesh engine rides the same Pallas
kernels as the single-device dispatch (VERDICT r3 item 2).

Stage 1 — data-axis-only mesh: every shard is whole frames and runs the
exact `_stack_core` dispatch of wow_stack (fused/merged kernels, in
interpret mode on the forced CPU test mesh).

Stage 2 — spatially tiled mesh: fused decompose+whiten groups on
halo-extended local blocks (overlap-save), XLA halo chain for the deep
tail, collective statistics.

Comparisons use the kernel-vs-XLA tolerance convention of
tests/test_pallas_merged.py (abs diff < 5e-6 · scale): batched/sharded
program shapes let XLA contract FMAs differently, so bitwise equality
is not promised across *program* boundaries (cf.
test_sharded_decompose_batched), only across identical programs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavelets_tpu.models.wow import (
    _stack_core,
    normalize_wow_params,
    wow_core,
    wow_stack,
)
from wavelets_tpu.ops.filters import B3SPLINE
from wavelets_tpu.parallel import make_mesh, sharded_wow

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


def _statics(n_scales, weights, dcs, has_noise, min_extent):
    n_scales, w, d, _ = normalize_wow_params(
        B3SPLINE, n_scales, list(weights), list(dcs), None, 0.0, 2,
        min_extent)
    return dict(
        sf=B3SPLINE, n_scales=n_scales, weights=w, whitening=True,
        denoise_coefficients=d, bilateral=None, bilateral_scaling=False,
        soft_threshold=True, preserve_variance=False, gamma=3.2,
        gamma_min=None, gamma_max=None, h=0.0, has_noise=has_noise)


def _forced_stack_ref(stack, noise, with_coefficients=True,
                      n_scales=None, weights=(), dcs=()):
    """Single-device reference: the exact wow_stack dispatch with the
    Pallas kernels forced (interpret mode on CPU)."""
    statics = _statics(n_scales, weights, dcs, noise is not None,
                       min(stack.shape[1:]))
    if noise is not None:
        noise_arr = jnp.broadcast_to(
            jnp.asarray(noise, stack.dtype), (stack.shape[0],))
    else:
        noise_arr = jnp.zeros((stack.shape[0],), stack.dtype)
    return _stack_core(stack, noise_arr, with_coefficients, statics,
                       force=True)


class TestStage1DataAxis:
    """sharded_wow on a data-only mesh == wow_stack dispatch."""

    def test_planes_vs_forced_stack(self, rng):
        mesh = make_mesh(data=8, rows=1, cols=1)
        stack = jnp.asarray(
            rng.normal(size=(8, 256, 256)).astype(np.float32))
        ref_r, ref_p = _forced_stack_ref(stack, 1.0, dcs=[5.0, 2.0])
        got_r, got_p = sharded_wow(stack, mesh, noise=1.0,
                                   denoise_coefficients=[5.0, 2.0])
        assert got_p.shape == ref_p.shape  # batch-major (B, L+1, H, W)
        assert float(jnp.max(jnp.abs(got_r - ref_r))) < 5e-6
        assert float(jnp.max(jnp.abs(got_p - ref_p))) < 5e-6

    def test_matches_wow_stack_semantics(self, rng):
        """Against the un-forced wow_stack (pure XLA on CPU) — pins the
        kernels' numerics, not just self-consistency."""
        mesh = make_mesh(data=4, rows=1, cols=1,
                         devices=jax.devices()[:4])
        stack = jnp.asarray(
            rng.normal(size=(4, 256, 256)).astype(np.float32))
        ref_r, ref_p = wow_stack(stack, noise=1.0,
                                 denoise_coefficients=[5.0, 2.0])
        got_r, got_p = sharded_wow(stack, mesh, noise=1.0,
                                   denoise_coefficients=[5.0, 2.0])
        assert float(jnp.max(jnp.abs(got_r - ref_r))) < 5e-6
        assert float(jnp.max(jnp.abs(got_p - ref_p))) < 5e-6

    def test_lazy_noise_per_frame(self, rng):
        """Lazy MAD noise stays per-frame across the sharded batch."""
        mesh = make_mesh(data=4, rows=1, cols=1,
                         devices=jax.devices()[:4])
        stack = jnp.asarray(
            (rng.normal(size=(4, 256, 256)) *
             np.array([1, 2, 3, 4])[:, None, None]).astype(np.float32))
        ref_r, _ = _forced_stack_ref(stack, None, dcs=[5.0, 2.0])
        got_r, _ = sharded_wow(stack, mesh,
                               denoise_coefficients=[5.0, 2.0])
        assert float(jnp.max(jnp.abs(got_r - ref_r))) < 5e-6

    def test_serving_recon_matches_planes_mode(self, rng):
        mesh = make_mesh(data=8, rows=1, cols=1)
        stack = jnp.asarray(
            rng.normal(size=(8, 256, 256)).astype(np.float32))
        r1, _ = sharded_wow(stack, mesh, noise=1.0,
                            denoise_coefficients=[5.0, 2.0])
        r2, none = sharded_wow(stack, mesh, noise=1.0,
                               denoise_coefficients=[5.0, 2.0],
                               with_coefficients=False)
        assert none is None
        # serving rides the merged kernels, planes mode the kernel
        # pair — same math, different fusion units
        assert float(jnp.max(jnp.abs(r1 - r2))) < 5e-6


class TestStage2Tiled:
    """Spatially tiled mesh: fused whiten groups on halo-extended
    blocks + XLA halo deep tail."""

    def _ref_single(self, img, noise, n_scales, dcs):
        statics = _statics(n_scales, (), dcs, noise is not None,
                           min(img.shape))
        noise_arr = (jnp.asarray(noise, img.dtype) if noise is not None
                     else jnp.zeros((), img.dtype))
        return wow_core(img, noise_arr, fuse="force",
                        planes_layout="cube", **statics)

    def test_tiled_vs_forced_single(self, rng):
        mesh = make_mesh(data=1, rows=2, cols=2,
                         devices=jax.devices()[:4])
        img = jnp.asarray(
            rng.normal(size=(512, 512)).astype(np.float32))
        ref_r, ref_p = self._ref_single(img, 1.0, 5, [5.0, 2.0])
        got_r, got_p = sharded_wow(img, mesh, n_scales=5, noise=1.0,
                                   denoise_coefficients=[5.0, 2.0])
        assert got_p.shape == (6, 512, 512)
        assert float(jnp.max(jnp.abs(got_r - ref_r))) < 5e-6
        assert float(jnp.max(jnp.abs(got_p - ref_p))) < 5e-6

    def test_tiled_vs_xla_semantics(self, rng):
        """Against the pure XLA single-device path — independent of the
        kernels on both sides of the comparison."""
        from wavelets_tpu.models.wow import wow

        mesh = make_mesh(data=1, rows=2, cols=2,
                         devices=jax.devices()[:4])
        img = jnp.asarray(
            rng.normal(size=(512, 512)).astype(np.float32))
        ref_r, _ = wow(img, n_scales=4, noise=1.0,
                       denoise_coefficients=[5.0, 2.0])
        got_r, _ = sharded_wow(img, mesh, n_scales=4, noise=1.0,
                               denoise_coefficients=[5.0, 2.0])
        assert float(jnp.max(jnp.abs(got_r - np.asarray(ref_r)))) < 5e-6

    def test_tiled_lazy_noise(self, rng):
        mesh = make_mesh(data=1, rows=2, cols=2,
                         devices=jax.devices()[:4])
        img = jnp.asarray(
            rng.normal(size=(512, 512)).astype(np.float32))
        ref_r, _ = self._ref_single(img, None, 4, [5.0, 2.0])
        got_r, _ = sharded_wow(img, mesh, n_scales=4,
                               denoise_coefficients=[5.0, 2.0])
        assert float(jnp.max(jnp.abs(got_r - ref_r))) < 5e-6

    def test_tiled_serving_bitwise(self, rng):
        """Serving mode skips the plane writes on the *same* tile plan
        — the reconstruction is unchanged (within-path contract)."""
        mesh = make_mesh(data=1, rows=2, cols=2,
                         devices=jax.devices()[:4])
        img = jnp.asarray(
            rng.normal(size=(512, 512)).astype(np.float32))
        r1, _ = sharded_wow(img, mesh, n_scales=4, noise=1.0,
                            denoise_coefficients=[5.0, 2.0])
        r2, none = sharded_wow(img, mesh, n_scales=4, noise=1.0,
                               denoise_coefficients=[5.0, 2.0],
                               with_coefficients=False)
        assert none is None
        assert np.array_equal(np.asarray(r1), np.asarray(r2))

    def test_tiled_batched(self, rng):
        """data × rows×cols mesh over a stack: per-frame statistics on
        halo-tiled blocks."""
        mesh = make_mesh(data=2, rows=2, cols=1,
                         devices=jax.devices()[:4])
        stack = jnp.asarray(
            (rng.normal(size=(2, 512, 256)) *
             np.array([1, 3])[:, None, None]).astype(np.float32))
        refs = [self._ref_single(stack[i], None, 3, [5.0, 2.0])[0]
                for i in range(2)]
        got_r, got_p = sharded_wow(stack, mesh, n_scales=3,
                                   denoise_coefficients=[5.0, 2.0])
        assert got_p.shape == (2, 4, 512, 256)  # batch-major
        for i in range(2):
            d = float(jnp.max(jnp.abs(got_r[i] - refs[i])))
            assert d < 5e-6, (i, d)

    def test_small_tiles_fall_back(self, rng):
        """Local blocks under the kernel minimum keep the XLA halo
        body (no stage-2 dispatch) and still match wow()."""
        from wavelets_tpu.models.wow import wow

        mesh = make_mesh(data=1, rows=2, cols=2,
                         devices=jax.devices()[:4])
        img = jnp.asarray(rng.normal(size=(128, 128)))
        ref_r, _ = wow(img, denoise_coefficients=[5, 2])
        got_r, _ = sharded_wow(img, mesh, denoise_coefficients=[5, 2])
        np.testing.assert_allclose(np.asarray(got_r), np.asarray(ref_r),
                                   rtol=1e-11, atol=1e-12)


class TestBandDeepTail:
    """Round-5 sharded deep tail: scales past the whiten groups reshard
    to full-width row bands (all_to_all over the col ring) and run the
    halo-mode deep stream kernel — ppermute halos while the reach fits
    the band, all_gather-built windows past it — instead of the XLA
    halo chain (VERDICT r4 item 3)."""

    def _ref_single(self, img, noise, n_scales, dcs):
        statics = _statics(n_scales, (), dcs, noise is not None,
                           min(img.shape))
        noise_arr = (jnp.asarray(noise, img.dtype) if noise is not None
                     else jnp.zeros((), img.dtype))
        return wow_core(img, noise_arr, fuse="force",
                        planes_layout="cube", **statics)

    def test_band_plan_engages(self):
        from wavelets_tpu.parallel.sharded import _deep_tail_band_plan
        from wavelets_tpu.ops.filters import B3SPLINE as SF

        # 512² on 2×2: Hb=128, W=512; tail s=4..6 all stream-feasible
        assert _deep_tail_band_plan(256, 256, 2, jnp.float32, SF,
                                    4, 7) == 128
        # reach gate: scale 4 on a 64-row band is infeasible (hw·D<32
        # fails at s=3 but 4 is fine; 8-row interior fails stream)
        assert _deep_tail_band_plan(16, 256, 2, jnp.float32, SF,
                                    4, 7) == 0

    def test_band_tail_deep_vs_single(self, rng):
        """2×2 mesh, L7 at 512²: tail scales 4 (R=64 < Hb: ppermute
        halo), 5 (R=128 == Hb), 6 (R=256 > Hb: all_gather window) —
        exercises the reshard, both extension paths, and the kernel."""
        from wavelets_tpu.parallel.sharded import _deep_tail_band_plan

        mesh = make_mesh(data=1, rows=2, cols=2,
                         devices=jax.devices()[:4])
        img = jnp.asarray(
            rng.normal(size=(512, 512)).astype(np.float32))
        assert _deep_tail_band_plan(256, 256, 2, img.dtype, B3SPLINE,
                                    4, 7) > 0
        ref_r, ref_p = self._ref_single(img, 1.0, 7, [5.0, 2.0])
        got_r, got_p = sharded_wow(img, mesh, n_scales=7, noise=1.0,
                                   denoise_coefficients=[5.0, 2.0])
        assert got_p.shape == (8, 512, 512)
        assert float(jnp.max(jnp.abs(got_r - ref_r))) < 5e-6
        assert float(jnp.max(jnp.abs(got_p - ref_p))) < 5e-6

    def test_band_tail_rows_mesh_batched(self, rng):
        """rows-only mesh (no reshard) over a stack with per-frame
        statistics and a deep tail."""
        mesh = make_mesh(data=2, rows=2, cols=1,
                         devices=jax.devices()[:4])
        stack = jnp.asarray(
            (rng.normal(size=(2, 512, 512)) *
             np.array([1, 3])[:, None, None]).astype(np.float32))
        refs = [self._ref_single(stack[i], None, 6, [5.0, 2.0])[0]
                for i in range(2)]
        got_r, got_p = sharded_wow(stack, mesh, n_scales=6,
                                   denoise_coefficients=[5.0, 2.0])
        assert got_p.shape == (2, 7, 512, 512)
        for i in range(2):
            d = float(jnp.max(jnp.abs(got_r[i] - refs[i])))
            assert d < 5e-6, (i, d)
