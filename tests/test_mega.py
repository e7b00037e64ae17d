"""Fully-fused single-pass WOW kernel (interpret mode): numerically
verified even though not auto-dispatched (VPU-bound at the VMEM-forced
tile size on v5e — see models/wow.py)."""

import importlib

import jax.numpy as jnp
import numpy as np
import pytest

W = importlib.import_module("wavelets_tpu.models.wow")
from wavelets_tpu.core.transform import decompose
from wavelets_tpu.ops.filters import B3SPLINE, TRIANGLE


@pytest.mark.parametrize("sf,level,dc,soft", [
    (B3SPLINE, 6, (0.0,) * 6 + (1.0,), True),
    (B3SPLINE, 6, (5.0, 2.0) + (0.0,) * 4 + (1.0,), True),
    (B3SPLINE, 4, (5.0, 2.0, 0.0, 0.0, 1.0), False),
    (TRIANGLE, 6, (3.0,) + (0.0,) * 5 + (1.0,), True),
])
def test_mega_matches_xla_body(rng, sf, level, dc, soft):
    x = jnp.asarray(rng.normal(size=(512, 512)).astype(np.float32))
    planes = decompose(x, level, sf)
    weights = (1.0,) * (level + 1)
    ref_r, ref_p = W._wow_body(
        planes, jnp.zeros(()), False, sf, level, weights, True, dc,
        False, soft, False, 3.2, None, None, 0.0)
    got_r, got_p = W._wow_mega(
        x, jnp.zeros(()), False, sf, level, weights, dc, soft)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(ref_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref_p),
                               rtol=1e-4, atol=1e-5)
