"""ctypes binding for the C++ batch image loader (native/loader.cpp).

GIL-free threaded JPEG decode + shortest-edge resize + center crop into a
caller buffer. Auto-builds the shared library with g++ on first use if
missing; falls back cleanly to the PIL path when the toolchain or libjpeg
is unavailable.

Numerics note: the native path uses bilinear resampling (throughput
path); the PIL path (data/preprocess.py) is bicubic and matches the
reference's CLIPProcessor bit-for-bit — use that for parity evals.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "loader.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "libvctloader.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO):
            if not os.path.exists(_SRC):
                _build_failed = True
                return None
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC,
                     "-ljpeg", "-lpthread"],
                    check=True, capture_output=True, timeout=120)
                log.info("built native loader at %s", _SO)
            except Exception as e:
                log.warning("native loader build failed (%s); "
                            "falling back to PIL", e)
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.vct_load_batch.restype = ctypes.c_int
            lib.vct_load_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int), ctypes.c_int]
            _lib = lib
        except OSError as e:
            log.warning("native loader unavailable (%s)", e)
            _build_failed = True
        return _lib


def native_available() -> bool:
    return _load() is not None


def load_batch_native(paths: List[str], image_size: int,
                      n_threads: Optional[int] = None
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Decode a batch -> (uint8 [N,S,S,3], ok mask [N]).

    Raises RuntimeError when the native library is unavailable; callers
    should gate on native_available().
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.empty((n, image_size, image_size, 3), np.uint8)
    status = np.zeros((n,), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    if n_threads is None:
        n_threads = min(n, os.cpu_count() or 1)
    lib.vct_load_batch(
        arr, n, image_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n_threads)
    return out, status.astype(bool)
