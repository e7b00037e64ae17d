"""Streaming pipeline (disk → WOW → disk) and CLI."""

import numpy as np
import pytest

import wavelets_tpu as wt
from wavelets_tpu.cli import main as cli_main
from wavelets_tpu.models.pipeline import process_stack


@pytest.fixture
def stack_file(tmp_path, rng):
    frames = (rng.uniform(100, 60000, size=(5, 128, 128))
              ).astype(np.uint16)
    path = tmp_path / "in.raw"
    frames.tofile(path)
    return str(path), frames


def test_process_stack(stack_file, tmp_path):
    path, frames = stack_file
    out = str(tmp_path / "out.raw")
    n, dt, fps = process_stack(
        path, out, 5, (128, 128), dtype="uint16", batch=2,
        denoise_coefficients=[5, 2])
    assert n == 5 and fps > 0
    result = np.fromfile(out, np.float32).reshape(5, 128, 128)
    # batch padding must not leak: frame 4 equals a direct wow call
    ref, _ = wt.wow(frames[4].astype(np.float32),
                    denoise_coefficients=[5, 2])
    np.testing.assert_allclose(result[4], np.asarray(ref), rtol=1e-4,
                               atol=1e-3)


def test_cli_wow(stack_file, tmp_path):
    path, frames = stack_file
    out = str(tmp_path / "cli_out.raw")
    rc = cli_main(["wow", path, out, "--frames", "5", "--shape", "128",
                   "128", "--dtype", "uint16", "--denoise", "5", "2",
                   "--batch", "3"])
    assert rc == 0
    result = np.fromfile(out, np.float32)
    assert result.size == 5 * 128 * 128
    assert np.isfinite(result).all()


def test_cli_decompose(stack_file, tmp_path):
    path, _ = stack_file
    out = str(tmp_path / "coef.npz")
    rc = cli_main(["decompose", path, out, "--shape", "128", "128",
                   "--dtype", "uint16", "--level", "3", "--frames", "5"])
    assert rc == 0
    from wavelets_tpu.utils.io import load_coefficients

    coeffs = load_coefficients(out)
    assert len(coeffs) == 4


def test_checked_validation():
    import jax.numpy as jnp

    from wavelets_tpu.utils.validation import assert_finite, checked

    ok = checked(lambda x: x * 2)(jnp.ones(4))
    np.testing.assert_array_equal(np.asarray(ok), 2 * np.ones(4))
    with pytest.raises(Exception):
        checked(lambda x: x / jnp.zeros(4))(jnp.ones(4))
    with pytest.raises(FloatingPointError):
        assert_finite(np.array([1.0, np.inf]))


def test_cli_denoise_and_rl(tmp_path, rng):
    from wavelets_tpu.cli import main

    frames = (rng.normal(size=(2, 128, 128)) * 50 + 300).astype(
        np.float32)
    inp = str(tmp_path / "in.raw")
    frames.tofile(inp)

    outp = str(tmp_path / "dn.raw")
    assert main(["denoise", inp, outp, "--shape", "128", "128",
                 "--frames", "2", "--weights", "5", "3"]) == 0
    out = np.fromfile(outp, np.float32).reshape(2, 128, 128)
    assert np.isfinite(out).all()
    import wavelets_tpu as wt
    want = np.asarray(wt.denoise(frames[0], [5, 3]))
    assert np.allclose(out[0], want, atol=1e-5)

    g = np.exp(-((np.arange(9) - 4) ** 2) / 4.0)
    psf = np.outer(g, g).astype(np.float32)
    psf /= psf.sum()
    pf = str(tmp_path / "psf.npy")
    np.save(pf, psf)
    outr = str(tmp_path / "rl.raw")
    assert main(["rl", inp, outr, "--shape", "128", "128", "--frames",
                 "2", "--psf", pf, "--iterations", "2"]) == 0
    out = np.fromfile(outr, np.float32).reshape(2, 128, 128)
    assert np.isfinite(out).all()


def test_process_stack_mesh(tmp_path, rng):
    """Mesh-aware serving: frames shard over data, tiles over
    rows x cols; output matches the single-device pipeline."""
    from wavelets_tpu.parallel import make_mesh

    frames = rng.normal(size=(4, 128, 128)).astype(np.float32)
    inp = str(tmp_path / "in.raw")
    frames.tofile(inp)

    out1 = str(tmp_path / "o1.raw")
    process_stack(inp, out1, 4, (128, 128), dtype="float32", batch=2,
                  denoise_coefficients=[5, 2], noise=1.0)
    mesh = make_mesh(data=2, rows=2, cols=2)
    out2 = str(tmp_path / "o2.raw")
    process_stack(inp, out2, 4, (128, 128), dtype="float32", batch=2,
                  mesh=mesh, denoise_coefficients=[5, 2], noise=1.0)
    a = np.fromfile(out1, np.float32).reshape(4, 128, 128)
    b = np.fromfile(out2, np.float32).reshape(4, 128, 128)
    d = np.abs(a - b).max()
    assert d < 1e-4, d
