"""ctypes bindings for the native (C++) batch-preparation kernels.

``libbatchops.so`` (built by scripts/build_native.sh from
ddpm_tpu/native/batchops.cpp) provides multithreaded, GIL-free versions of
the host-side input-pipeline hot ops. Everything degrades gracefully to the
numpy implementations in data/transforms.py when the library is absent.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

__all__ = ["available", "gather_flip_normalize", "float_to_uint8"]

_LIB_PATH = os.path.join(os.path.dirname(__file__), "lib", "libbatchops.so")
_lib = None


def _load():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.gather_flip_normalize.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.float_to_uint8.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
        ]
        _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def gather_flip_normalize(
    images: np.ndarray,
    indices: np.ndarray,
    flips: Optional[np.ndarray] = None,
    out: Optional[np.ndarray] = None,
    num_threads: int = 0,
) -> np.ndarray:
    """Gather uint8 NHWC images by index, flip, normalize to f32 [-1, 1]."""
    lib = _load()
    assert lib is not None
    assert images.dtype == np.uint8 and images.flags.c_contiguous
    indices = np.ascontiguousarray(indices, np.int64)
    n = len(indices)
    _, h, w, c = images.shape
    if out is None:
        out = np.empty((n, h, w, c), np.float32)
    flips_ptr = None
    if flips is not None:
        flips = np.ascontiguousarray(flips, np.uint8)
        flips_ptr = flips.ctypes.data_as(ctypes.c_void_p)
    lib.gather_flip_normalize(
        images.ctypes.data_as(ctypes.c_void_p),
        indices.ctypes.data_as(ctypes.c_void_p),
        n, h, w, c,
        flips_ptr,
        out.ctypes.data_as(ctypes.c_void_p),
        num_threads,
    )
    return out


def float_to_uint8(x: np.ndarray, num_threads: int = 0) -> np.ndarray:
    """Sampler-output conversion: clip(round(x*127.5+127.5)) as uint8."""
    lib = _load()
    assert lib is not None
    x = np.ascontiguousarray(x, np.float32)
    out = np.empty(x.shape, np.uint8)
    lib.float_to_uint8(
        x.ctypes.data_as(ctypes.c_void_p), x.size,
        out.ctypes.data_as(ctypes.c_void_p), num_threads,
    )
    return out
