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

__all__ = ["available", "gather_flip_normalize", "gather_flip_u8", "float_to_uint8"]

_LIB_PATH = os.path.join(os.path.dirname(__file__), "lib", "libbatchops.so")
_lib = None
_build_attempted = False


def _try_build() -> None:
    """Compile libbatchops.so on first use when a compiler is present.

    Skipped when DDPM_TPU_NO_NATIVE_BUILD is set. The compile goes to a
    process-unique temp name and is moved into place atomically, so
    concurrent first-importers (e.g. pytest-xdist workers) can race safely —
    rename is atomic within a filesystem and last-writer-wins is fine for
    identical artifacts.
    """
    global _build_attempted
    if _build_attempted or os.environ.get("DDPM_TPU_NO_NATIVE_BUILD"):
        return
    _build_attempted = True
    import shutil
    import subprocess

    gxx = shutil.which("g++")
    if gxx is None:
        return
    src = os.path.join(os.path.dirname(__file__), "batchops.cpp")
    lib_dir = os.path.dirname(_LIB_PATH)
    os.makedirs(lib_dir, exist_ok=True)
    tmp = f"{_LIB_PATH}.build.{os.getpid()}"
    try:
        subprocess.run(
            [gxx, "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-pthread", src, "-o", tmp],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, _LIB_PATH)
    except Exception:
        if os.path.exists(tmp):
            os.unlink(tmp)


def _load():
    global _lib
    if _lib is None:
        if not os.path.exists(_LIB_PATH):
            _try_build()
        if not os.path.exists(_LIB_PATH):
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        gather_args = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        lib.gather_flip_normalize.argtypes = gather_args
        lib.float_to_uint8.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
        ]
        # older .so without the u8 kernel: rebuild once, else disable it
        try:
            lib.gather_flip_u8.argtypes = gather_args
        except AttributeError:
            _try_build()
            lib = ctypes.CDLL(_LIB_PATH)
            lib.gather_flip_normalize.argtypes = gather_args
            lib.float_to_uint8.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int,
            ]
            try:
                lib.gather_flip_u8.argtypes = gather_args
            except AttributeError:
                lib.gather_flip_u8 = None
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


def u8_available() -> bool:
    """True when the uint8 gather+flip kernel is loadable."""
    lib = _load()
    return lib is not None and getattr(lib, "gather_flip_u8", None) is not None


def gather_flip_u8(
    images: np.ndarray,
    indices: np.ndarray,
    flips: Optional[np.ndarray] = None,
    out: Optional[np.ndarray] = None,
    num_threads: int = 0,
) -> np.ndarray:
    """Gather uint8 NHWC images by index and flip; stays uint8 (the
    device_normalize=True batch-prep path — normalize happens on device)."""
    lib = _load()
    assert lib is not None and lib.gather_flip_u8 is not None
    assert images.dtype == np.uint8 and images.flags.c_contiguous
    indices = np.ascontiguousarray(indices, np.int64)
    n = len(indices)
    _, h, w, c = images.shape
    if out is None:
        out = np.empty((n, h, w, c), np.uint8)
    flips_ptr = None
    if flips is not None:
        flips = np.ascontiguousarray(flips, np.uint8)
        flips_ptr = flips.ctypes.data_as(ctypes.c_void_p)
    lib.gather_flip_u8(
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
