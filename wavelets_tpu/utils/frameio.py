"""Native frame-stack IO: ctypes binding for native/libwtio.so.

The host-side data path for streaming large frame stacks into the
device: frames are memory-mapped by the C++ library (native/frameio.cc)
and converted to float32 staging buffers with multi-threaded native
conversion/endian-swapping — no GIL-bound Python inner loops.  The
library auto-builds on first use if the shared object is missing and a
compiler is available; everything degrades gracefully to a numpy
fallback otherwise."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["FrameStack", "native_available", "write_array"]

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libwtio.so")

#: dtype → (enum in frameio.cc, stored itemsize)
_DTYPES = {
    np.dtype(np.uint8): (0, 1),
    np.dtype(np.uint16): (1, 2),
    np.dtype(np.int16): (2, 2),
    np.dtype(np.uint32): (3, 4),
    np.dtype(np.int32): (4, 4),
    np.dtype(np.float32): (5, 4),
    np.dtype(np.float64): (6, 8),
    np.dtype(">u2"): (7, 2),
    np.dtype(">f4"): (8, 4),
}

_lib = None
_lib_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    src = os.path.join(_NATIVE_DIR, "frameio.cc")
    stale = (not os.path.exists(_SO_PATH)
             or (os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(_SO_PATH)))
    if stale:
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR, "-B"], check=True,
                           capture_output=True)
        except Exception:
            if not os.path.exists(_SO_PATH):
                return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    lib.wtio_open.restype = ctypes.c_void_p
    lib.wtio_open.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                              ctypes.c_int64, ctypes.c_int64]
    lib.wtio_n_frames.restype = ctypes.c_int64
    lib.wtio_n_frames.argtypes = [ctypes.c_void_p]
    lib.wtio_prefetch.restype = None
    lib.wtio_prefetch.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.wtio_read_frame_f32.restype = ctypes.c_int
    lib.wtio_read_frame_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int]
    lib.wtio_read_batch_f32.restype = ctypes.c_int
    lib.wtio_read_batch_f32.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int]
    lib.wtio_close.restype = None
    lib.wtio_close.argtypes = [ctypes.c_void_p]
    lib.wtio_write.restype = ctypes.c_int
    lib.wtio_write.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                               ctypes.c_int64]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


class FrameStack:
    """Reader for a raw frame stack stored contiguously on disk.

    ``shape`` is the per-frame shape; ``dtype`` the stored dtype (may be
    big-endian); frames convert to float32 on read.  Uses the native
    mmap+threads path when available, numpy otherwise.
    """

    def __init__(self, path: str, n_frames: int, shape: Tuple[int, ...],
                 dtype="uint16", offset: int = 0, threads: int = 4):
        self.path = path
        self.n_frames = int(n_frames)
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)
        if self.dtype not in _DTYPES:
            raise ValueError(f"unsupported stored dtype {self.dtype}")
        self._enum, itemsize = _DTYPES[self.dtype]
        self.n_elems = int(np.prod(self.shape))
        self.frame_bytes = self.n_elems * itemsize
        self.offset = int(offset)
        self.threads = int(threads)
        self._lib = _load()
        self._handle = None
        if self._lib is not None:
            self._handle = self._lib.wtio_open(
                path.encode(), self.offset, self.frame_bytes,
                self.n_frames)
            if not self._handle:
                raise OSError(f"wtio_open failed for {path!r} (size/"
                              "offset mismatch?)")
        else:  # pure-numpy fallback
            self._mm = np.memmap(path, mode="r", dtype=np.uint8)
            need = self.offset + self.frame_bytes * self.n_frames
            if self._mm.size < need:
                raise OSError(f"{path!r} too small for frame stack")

    def __len__(self) -> int:
        return self.n_frames

    def prefetch(self, idx: int) -> None:
        if self._handle:
            self._lib.wtio_prefetch(self._handle, int(idx))

    def __getitem__(self, idx: int) -> np.ndarray:
        if not (0 <= idx < self.n_frames):
            raise IndexError(idx)
        out = np.empty(self.shape, np.float32)
        if self._handle:
            rc = self._lib.wtio_read_frame_f32(
                self._handle, int(idx), self._enum,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.n_elems, self.threads)
            if rc != 0:
                raise OSError(f"wtio_read_frame_f32 failed rc={rc}")
            return out
        start = self.offset + idx * self.frame_bytes
        raw = self._mm[start:start + self.frame_bytes]
        arr = raw.view(self.dtype)[:self.n_elems]
        return arr.astype(np.float32).reshape(self.shape)

    def read_batch(self, indices: Sequence[int]) -> np.ndarray:
        """Read ``indices`` into a contiguous (B, *shape) f32 batch."""
        idx = np.asarray(list(indices), np.int64)
        out = np.empty((len(idx),) + self.shape, np.float32)
        if self._handle:
            rc = self._lib.wtio_read_batch_f32(
                self._handle,
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(idx), self._enum,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self.n_elems, self.threads)
            if rc != 0:
                raise OSError(f"wtio_read_batch_f32 failed rc={rc}")
            return out
        for i, j in enumerate(idx):
            out[i] = self[int(j)]
        return out

    def close(self) -> None:
        if self._handle:
            self._lib.wtio_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def write_array(path: str, arr: np.ndarray) -> None:
    """Write a contiguous array to disk via the native path (falls back
    to numpy tofile)."""
    arr = np.ascontiguousarray(arr)
    lib = _load()
    if lib is not None:
        rc = lib.wtio_write(path.encode(), arr.ctypes.data,
                            arr.nbytes)
        if rc != 0:
            raise OSError(f"wtio_write failed rc={rc}")
        return
    arr.tofile(path)
