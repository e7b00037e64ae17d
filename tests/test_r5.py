"""Round-5 features: bf16 deep stream kernels, halo-mode deep step,
3-D volume fast path, batched enhance channels."""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavelets_tpu.core.transform import decompose
from wavelets_tpu.ops import pallas_conv, pallas_deep
from wavelets_tpu.ops.conv import smooth
from wavelets_tpu.ops.filters import B3SPLINE

W_mod = importlib.import_module("wavelets_tpu.models.wow")


class TestBf16Deep:
    def test_gates_accept_bf16(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 512, 512)).astype(
            np.float32)).astype(jnp.bfloat16)
        assert pallas_deep.can_deep(x, B3SPLINE, 4, None)
        assert pallas_deep.can_deep2(x, B3SPLINE, 4, None)
        # the BlockSpec fallback stays f32-only: H=544 is not a
        # multiple of D=64 (stream infeasible) but block-feasible —
        # f32 takes the fallback, bf16 must be rejected
        y32 = jax.ShapeDtypeStruct((1, 544, 512), jnp.float32)
        y16 = jax.ShapeDtypeStruct((1, 544, 512), jnp.bfloat16)
        assert pallas_deep.can_deep(y32, B3SPLINE, 6, None)
        assert not pallas_deep.can_deep(y16, B3SPLINE, 6, None)

    def test_step_matches_f32_oracle(self, rng):
        """bf16 ring + f32 folds: parity vs the f32 XLA chain on the
        bf16-rounded input at bf16 tolerance."""
        s = 4
        xb = jnp.asarray(rng.normal(size=(1, 512, 512)).astype(
            np.float32)).astype(jnp.bfloat16)
        zero1 = jnp.zeros((1,), jnp.float32)
        w, _, cn = pallas_deep.deep_whiten_step(
            xb, None, zero1, sf=B3SPLINE, scale=s, weight=1.0,
            soft=True, masked=False, write_plane=True, interpret=True)
        assert w.dtype == jnp.bfloat16 and cn.dtype == jnp.bfloat16
        xf = xb.astype(jnp.float32)
        cnx = smooth(xf, B3SPLINE, scale=s, axes=(1, 2))
        c = xf - cnx
        lp = smooth(c * c, B3SPLINE, scale=s, axes=(1, 2))
        lp = jnp.sqrt(jnp.where(lp <= 0, 1e-15, lp))
        wx = c / lp
        assert float(jnp.abs(w.astype(jnp.float32) - wx).max()) < 3e-2
        assert float(jnp.abs(cn.astype(jnp.float32) - cnx).max()) < 3e-2

    def test_pair_matches_singles(self, rng):
        s = 4
        xb = jnp.asarray(rng.normal(size=(1, 512, 512)).astype(
            np.float32)).astype(jnp.bfloat16)
        zero1 = jnp.zeros((1,), jnp.float32)
        thr2 = jnp.zeros((2, 1), jnp.float32)
        w1, w2, _, cn2 = pallas_deep.deep_whiten_step2(
            xb, None, thr2, sf=B3SPLINE, scale=s, weights=(1.0, 1.0),
            masked=(False, False), interpret=True)
        wa, _, ca = pallas_deep.deep_whiten_step(
            xb, None, zero1, sf=B3SPLINE, scale=s, weight=1.0,
            soft=True, masked=False, write_plane=True, interpret=True)
        wb, _, cb = pallas_deep.deep_whiten_step(
            ca, None, zero1, sf=B3SPLINE, scale=s + 1, weight=1.0,
            soft=True, masked=False, write_plane=True, interpret=True)
        # scale s is identical; s+1 differs only through the pair's
        # unrounded f32 intermediate carry (bf16 tolerance)
        assert float(jnp.abs((w1 - wa).astype(jnp.float32)).max()) == 0
        assert float(jnp.abs((w2 - wb).astype(jnp.float32)).max()) < 5e-2
        assert float(jnp.abs((cn2 - cb).astype(jnp.float32)).max()) < 5e-2

    def test_bf16_merged_wow_deep_tail(self, rng):
        """bf16 L6 at 512²: merged groups + bf16 deep steps vs the
        all-XLA bf16 engine (bf16 relative tolerance)."""
        x = jnp.asarray(rng.normal(size=(512, 512)).astype(
            np.float32)).astype(jnp.bfloat16)
        n = 6
        st = dict(sf=B3SPLINE, n_scales=n, weights=(1.0,) * (n + 1),
                  whitening=True, denoise_coefficients=(0.0,) * (n + 1),
                  bilateral=None, bilateral_scaling=False,
                  soft_threshold=True, preserve_variance=False,
                  gamma=3.2, gamma_min=None, gamma_max=None, h=0.0,
                  has_noise=True)
        rm, rows = W_mod._wow_body_merged(
            x, jnp.zeros((), jnp.float32), True, B3SPLINE, n,
            st["weights"], st["denoise_coefficients"], True,
            need_planes=True, planes_layout="rows")
        rx, _ = W_mod.wow_core(x, jnp.zeros((), x.dtype), fuse=False,
                               **st)
        scale = float(jnp.abs(rx.astype(jnp.float32)).max())
        d = float(jnp.abs(rm.astype(jnp.float32)
                          - rx.astype(jnp.float32)).max())
        assert d < 2e-2 * max(scale, 1.0), (d, scale)
        assert all(r.dtype == jnp.bfloat16 for r in rows)


class TestHaloMode:
    def test_bitwise_vs_reflection_mode(self, rng):
        """A symmetric-padded carry in halo mode reproduces the
        reflection-mode kernel bitwise (same values, same folds)."""
        for s in (4, 5):
            halo = 2 * B3SPLINE.half_width * (1 << s)
            x = jnp.asarray(
                rng.normal(size=(1, 512, 512)).astype(np.float32))
            zero1 = jnp.zeros((1,), jnp.float32)
            w_ref, _, cn_ref = pallas_deep.deep_whiten_step(
                x, None, zero1, sf=B3SPLINE, scale=s, weight=1.0,
                soft=True, masked=False, write_plane=True,
                interpret=True)
            ext = jnp.pad(x, ((0, 0), (halo, halo), (0, 0)),
                          mode="symmetric")
            assert pallas_deep.can_deep_halo(512, 512, x.dtype,
                                             B3SPLINE, s)
            w_h, _, cn_h = pallas_deep.deep_whiten_step(
                ext, None, zero1, sf=B3SPLINE, scale=s, weight=1.0,
                soft=True, masked=False, write_plane=True,
                interpret=True, halo=halo)
            assert np.array_equal(np.asarray(w_h), np.asarray(w_ref))
            assert np.array_equal(np.asarray(cn_h), np.asarray(cn_ref))


class TestVolumeFastPath:
    def test_matches_xla_volume(self, rng):
        vol = jnp.asarray(
            rng.normal(size=(8, 256, 256)).astype(np.float32))
        ref = decompose(vol, 3, B3SPLINE, use_pallas=False)
        got = pallas_conv.fused_volume_decompose(vol, 3, B3SPLINE,
                                                 interpret=True)
        assert got.shape == (4, 8, 256, 256)
        assert float(jnp.abs(got - ref).max()) < 1e-6
        assert float(jnp.abs(jnp.sum(got, 0) - vol).max()) < 1e-6

    def test_gates(self, rng):
        vol = jax.ShapeDtypeStruct((8, 256, 256), jnp.float32)
        assert pallas_conv.can_fuse_volume(vol, 3, B3SPLINE, None,
                                           "symmetric", backend="tpu")
        # a frame stack (axes=(1,2)) is NOT a volume
        assert not pallas_conv.can_fuse_volume(
            vol, 3, B3SPLINE, (1, 2), "symmetric", backend="tpu")
        # f64 stays on the XLA path
        v64 = jax.ShapeDtypeStruct((8, 256, 256), jnp.float64)
        assert not pallas_conv.can_fuse_volume(
            v64, 3, B3SPLINE, None, "symmetric", backend="tpu")


class TestEnhanceBatched:
    def test_channels_one_program_matches_loop(self, rng):
        from wavelets_tpu.models.enhance import enhance, prepare_params
        from wavelets_tpu.api import AtrousTransform

        img = rng.normal(size=(3, 128, 128)).astype(np.float32)

        def seq(weights, denoise, noise=None):
            at = AtrousTransform()
            outs = []
            wp = prepare_params(weights, 3)
            dp = prepare_params(denoise, 3)
            for c in range(3):
                wgt = list(wp[c]) + [1] * (len(dp[c]) - len(wp[c]))
                dns = list(dp[c]) + [0] * (len(wgt) - len(dp[c]))
                coeffs = at(img[c], len(wgt))
                coeffs.noise = (coeffs.get_noise()
                                if noise is None or noise[c] is None
                                else noise[c])
                coeffs.denoise(dns, weights=wgt)
                outs.append(jnp.sum(coeffs.data, axis=0))
            return jnp.stack(outs)

        for w, d, nz in [([[1, 1.2], [1, 1], [0.5, 2]],
                          [[5, 2], [3, 0], [0, 0]], None),
                         ([1.0, 1.0, 1.0],
                          [[5, 2], [4, 1], [3, 3]], [0.9, 1.1, 1.0])]:
            a = enhance(img, *(() if nz is None else (nz,)),
                        weights=w, denoise=d)
            b = seq(w, d, nz)
            assert float(jnp.abs(jnp.asarray(a) - b).max()) < 1e-6

    def test_mixed_lengths_fall_back(self, rng):
        from wavelets_tpu.models.enhance import enhance

        img = rng.normal(size=(3, 64, 64)).astype(np.float32)
        out = enhance(img, weights=[[1, 1], [1], [1, 1, 1]],
                      denoise=[[5, 2], [3], [1, 1, 1]])
        assert np.asarray(out).shape == (3, 64, 64)


class TestRichardsonLucyR5:
    def test_stack_matches_per_frame(self, rng):
        from wavelets_tpu.models.richardson_lucy import (
            richardson_lucy, richardson_lucy_stack)

        psf = np.outer(*(np.hanning(5),) * 2).astype(np.float32)
        psf = psf / psf.sum()
        # positive data: RL's multiplicative update assumes a
        # nonnegative image (division by the blurred estimate)
        stack = (rng.normal(size=(2, 128, 128)) ** 2 +
                 np.array([1, 3])[:, None, None]).astype(np.float32)
        got = richardson_lucy_stack(stack, psf, iterations=4,
                                    fft=False)
        assert got.shape == stack.shape
        for i in range(2):
            ref = richardson_lucy(stack[i], psf, iterations=4,
                                  fft=False)
            d = float(jnp.abs(got[i] - ref).max())
            sc = float(jnp.abs(ref).max())
            assert d < 1e-5 * max(sc, 1.0), (i, d, sc)

    def test_fft_auto_dispatch(self):
        from wavelets_tpu.models.richardson_lucy import _fft_auto

        assert _fft_auto("auto", (15, 15)) is True
        assert _fft_auto("auto", (5, 5)) is False
        assert _fft_auto(False, (15, 15)) is False
        assert _fft_auto(True, (3, 3)) is True

    def test_stack_golden_vs_reference(self, rng):
        """Golden: stack mode vs the live reference per frame."""
        from tests.reference_shim import import_watroo

        ref_rl = import_watroo().richardson_lucy
        from wavelets_tpu.models.richardson_lucy import (
            richardson_lucy_stack)

        psf = np.outer(*(np.hanning(5),) * 2)
        psf = psf / psf.sum()
        stack = rng.normal(size=(2, 64, 64)) ** 2 + 1.0
        got = richardson_lucy_stack(stack, psf, iterations=3,
                                    denoise_coefficients=(5.0, 2.0),
                                    fft=False)
        for i in range(2):
            ref = ref_rl(np.copy(stack[i]), np.copy(psf), iterations=3,
                         denoise_coefficients=(5.0, 2.0))
            np.testing.assert_allclose(np.asarray(got[i]), ref,
                                       rtol=1e-6, atol=1e-7)
