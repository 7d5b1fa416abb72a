"""ctypes bindings for the native C++ data-loading runtime (runtime/image_io.cc).

The reference's input pipeline is torch DataLoader worker processes running PIL
(train.py:168-174); here decode + PIL-semantics resize + batch assembly run in
C++ with a thread pool (GIL released for the whole batch). Falls back to PIL
transparently if the shared library can't be built.

  from adaptersis_tpu.data import native
  native.available()                       -> bool
  native.load_image(path, (H, W), "rgb")   -> np.uint8 (H, W, 3)
  native.load_batch(paths, (H, W))         -> np.uint8 (N, H, W, 3)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_RUNTIME_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "runtime")
_LIB_PATH = os.path.abspath(os.path.join(_RUNTIME_DIR, "libasn_io.so"))
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        r = subprocess.run(["make", "-C", os.path.abspath(_RUNTIME_DIR)],
                           capture_output=True, text=True, timeout=120)
        return r.returncode == 0
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.asn_decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
        lib.asn_decode_resize.restype = ctypes.c_int
        lib.asn_batch_load.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        lib.asn_batch_load.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def load_image(path: str, size: Tuple[int, int], mode: str = "rgb",
               resample: str = "bilinear") -> Optional[np.ndarray]:
    """Decode+resize one image natively; None on failure (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    c = 3 if mode == "rgb" else 1
    h, w = size
    out = np.empty((h, w, c), np.uint8)
    rc = lib.asn_decode_resize(
        path.encode(), h, w, c, 1 if resample == "bilinear" else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        return None
    return out[:, :, 0] if c == 1 else out


def load_batch(paths: Sequence[str], size: Tuple[int, int], mode: str = "rgb",
               resample: str = "bilinear", n_threads: int = 8) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    c = 3 if mode == "rgb" else 1
    h, w = size
    n = len(paths)
    out = np.empty((n, h, w, c), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.asn_batch_load(
        arr, n, h, w, c, 1 if resample == "bilinear" else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads)
    if failures:
        return None
    return out
