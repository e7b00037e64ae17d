"""Native frame-stack IO (C++ mmap/convert path + numpy fallback)."""

import numpy as np
import pytest

from wavelets_tpu.utils import frameio
from wavelets_tpu.utils.frameio import FrameStack, write_array


@pytest.fixture
def stack_file(tmp_path, rng):
    frames = (rng.uniform(0, 60000, size=(5, 32, 48))).astype(np.uint16)
    path = tmp_path / "stack.raw"
    frames.tofile(path)
    return str(path), frames


def test_native_builds():
    assert frameio.native_available(), "C++ frameio failed to build/load"


def test_read_frames(stack_file):
    path, frames = stack_file
    with FrameStack(path, 5, (32, 48), dtype="uint16") as fs:
        assert len(fs) == 5
        for i in range(5):
            got = fs[i]
            assert got.dtype == np.float32
            np.testing.assert_array_equal(got, frames[i].astype(np.float32))


def test_read_batch(stack_file):
    path, frames = stack_file
    with FrameStack(path, 5, (32, 48), dtype="uint16") as fs:
        batch = fs.read_batch([4, 0, 2])
        assert batch.shape == (3, 32, 48)
        np.testing.assert_array_equal(
            batch, frames[[4, 0, 2]].astype(np.float32))


def test_big_endian(tmp_path, rng):
    frames = rng.normal(size=(3, 16, 16)).astype(">f4")
    path = tmp_path / "be.raw"
    frames.tofile(path)
    with FrameStack(str(path), 3, (16, 16), dtype=">f4") as fs:
        np.testing.assert_array_equal(
            fs[1], frames[1].astype(np.float32))


def test_offset_and_bounds(tmp_path, rng):
    header = b"HDR!" * 4
    frames = rng.normal(size=(2, 8, 8)).astype(np.float32)
    path = tmp_path / "off.raw"
    with open(path, "wb") as f:
        f.write(header)
        f.write(frames.tobytes())
    with FrameStack(str(path), 2, (8, 8), dtype="float32",
                    offset=len(header)) as fs:
        np.testing.assert_array_equal(fs[0], frames[0])
        with pytest.raises(IndexError):
            fs[2]
    with pytest.raises(OSError):
        FrameStack(str(path), 99, (8, 8), dtype="float32")


def test_write_array(tmp_path, rng):
    arr = rng.normal(size=(64, 64)).astype(np.float32)
    path = str(tmp_path / "out.raw")
    write_array(path, arr)
    back = np.fromfile(path, np.float32).reshape(64, 64)
    np.testing.assert_array_equal(back, arr)


def test_pipeline_from_disk(stack_file):
    """End-to-end: native IO feeding the wavelet pipeline."""
    import wavelets_tpu as wt

    path, frames = stack_file
    with FrameStack(path, 5, (32, 48), dtype="uint16") as fs:
        img = fs[0]
        coeffs = wt.AtrousTransform()(img, 2)
        recon = np.sum(np.asarray(coeffs), axis=0)
        np.testing.assert_allclose(recon, img, rtol=1e-5, atol=1e-2)
