"""fused_whiten_pieces variants (ops/pallas_wow.py) in interpreter
mode: write_planes / write_gamma / column-edge-reuse combinations vs
the plain XLA whitening ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavelets_tpu.core.transform import decompose_pieces
from wavelets_tpu.ops.conv import smooth
from wavelets_tpu.ops.filters import B3SPLINE
from wavelets_tpu.ops.pallas_wow import fused_whiten_pieces


def _ref(img, n_fast, thr_v=0.0):
    cur = img
    whites, masked_sum = [], jnp.zeros_like(img)
    for s in range(n_fast):
        sm = smooth(cur, B3SPLINE, scale=s)
        c = cur - sm
        lp = smooth(c * c, B3SPLINE, scale=s)
        lp = jnp.sqrt(jnp.where(lp <= 0, 1e-15, lp))
        if thr_v:
            t = thr_v
            c = c * jax.scipy.special.erf(jnp.abs(c) / t)
        masked_sum = masked_sum + c
        whites.append(c / lp)
        cur = sm
    return whites, sum(whites), masked_sum


@pytest.mark.parametrize("write_planes,write_gamma", [
    (True, False), (False, False), (True, True)])
def test_whiten_pieces_variants(rng, write_planes, write_gamma):
    img = jnp.asarray(rng.normal(size=(512, 768)).astype(np.float32))
    n_fast = 4
    pieces, layout = decompose_pieces(img, n_fast, B3SPLINE)
    pieces_b = tuple(p[:, None] for p in pieces)
    factors = jnp.ones((n_fast,), jnp.float32)
    thr = jnp.zeros((n_fast,), jnp.float32)
    outs = fused_whiten_pieces(
        pieces_b, factors, thr, B3SPLINE, n_fast,
        tuple(layout[:n_fast]), write_planes=write_planes,
        write_gamma=write_gamma, interpret=True)
    whites, recon, masked_sum = _ref(img, n_fast)
    scale = float(jnp.abs(recon).max())
    tol = 5e-6 * max(scale, 1)
    planes, partial = outs[0], outs[1]
    assert float(jnp.abs(partial[0] - recon).max()) < tol
    if write_planes:
        for s in range(n_fast):
            assert float(jnp.abs(planes[s, 0] - whites[s]).max()) < tol
    else:
        assert planes is None
    if write_gamma:
        g = outs[2][0]
        assert float(jnp.abs(g - masked_sum).max()) < tol
