"""ctypes binding for the C++ decode pool (native/loader.cpp).

Drop-in decode backend for ImageFolderDataset: decodes a whole batch of
JPEGs in parallel with libjpeg outside the GIL, bilinear-resizes, and
writes uint8 RGB straight into a numpy buffer.

The shared library is built FROM SOURCE on first use (`make -C native`,
~1 s; also rebuilt when loader.cpp is newer than the .so) — no binary is
vendored in git. `is_available()` gates tests and falls back to cv2/PIL
when the toolchain/libjpeg is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), 'native')
_LIB_PATH = os.path.join(_NATIVE_DIR, 'libgltvae_loader.so')

_lib = None
_build_attempted = False


def _ensure_built() -> bool:
    """Lazy build: make the .so from loader.cpp when missing or stale.
    One attempt per process; failure (no g++/libjpeg-dev) degrades to
    unavailable, never raises."""
    global _build_attempted
    src = os.path.join(_NATIVE_DIR, 'loader.cpp')
    fresh = (os.path.exists(_LIB_PATH) and os.path.exists(src)
             and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src))
    if fresh:
        return True
    if _build_attempted:
        return os.path.exists(_LIB_PATH)
    _build_attempted = True
    try:
        r = subprocess.run(['make', '-C', _NATIVE_DIR],
                           capture_output=True, timeout=120)
        if r.returncode != 0:
            return os.path.exists(_LIB_PATH)   # stale-but-present still loads
    except Exception:
        return os.path.exists(_LIB_PATH)
    return os.path.exists(_LIB_PATH)


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _ensure_built():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.gltvae_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
    lib.gltvae_decode_batch.restype = ctypes.c_int
    lib.gltvae_version.restype = ctypes.c_int
    _lib = lib
    return lib


def is_available() -> bool:
    return _load() is not None


def decode_batch(paths: Sequence[str], out_size: int,
                 center_crop: bool = False,
                 num_threads: int = 0) -> np.ndarray:
    """Decode+resize a batch of JPEG paths -> (N, S, S, 3) uint8."""
    lib = _load()
    if lib is None:
        raise RuntimeError(
            f'native loader not built; run `make -C native` '
            f'(expected {_LIB_PATH})')
    n = len(paths)
    out = np.empty((n, out_size, out_size, 3), dtype=np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if num_threads <= 0:
        num_threads = os.cpu_count() or 1
    rc = lib.gltvae_decode_batch(
        arr, n, out_size, int(center_crop),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), num_threads)
    if rc != 0:
        raise IOError(f'JPEG decode failed for {paths[-rc - 1]!r}')
    return out


class NativeImageFolderDataset:
    """ImageFolderDataset-compatible dataset backed by the C++ pool."""

    def __init__(self, image_dir: str, split, image_size: int,
                 center_crop: bool = False, num_threads: int = 0):
        if not is_available():
            raise RuntimeError('native loader not built (make -C native)')
        self.image_dir = image_dir
        self.split = split
        self.image_size = image_size
        self.center_crop = center_crop
        self.num_threads = num_threads

    def __len__(self):
        return len(self.split)

    def fetch(self, idxs: np.ndarray):
        paths = [os.path.join(self.image_dir, self.split.ids[i])
                 for i in idxs]
        imgs = decode_batch(paths, self.image_size, self.center_crop,
                            self.num_threads)
        return imgs, self.split.labels[idxs].astype(np.float32)
