"""ctypes bindings for the native C++ data pipeline (native/adalog_data.cpp).

Build: ``make -C native`` (needs g++ and libjpeg). When the shared library is
absent the package transparently falls back to the PIL pipeline in
data/imagenet.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libadalog_data.so")
_lib: Optional[ctypes.CDLL] = None


def build(quiet: bool = True) -> bool:
    """Compile the native library in-tree; returns availability."""
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    try:
        subprocess.run(["make", "-C", os.path.join(root, "native")],
                       check=True, capture_output=quiet)
    except Exception:
        return False
    return available()


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.adalog_decode_preprocess.restype = ctypes.c_int
    lib.adalog_decode_preprocess.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_double,
        fp, fp, fp]
    lib.adalog_preprocess_rgb8.restype = ctypes.c_int
    lib.adalog_preprocess_rgb8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, fp, fp, fp]
    lib.adalog_batch_load.restype = ctypes.c_int
    lib.adalog_batch_load.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_double, fp, fp, fp, ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fp(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def decode_preprocess(jpeg_bytes: bytes, out_size: int, crop_pct: float,
                      mean, std) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    out = np.empty((out_size, out_size, 3), np.float32)
    rc = lib.adalog_decode_preprocess(
        jpeg_bytes, len(jpeg_bytes), out_size, crop_pct,
        _fp(mean), _fp(std), _fp(out))
    return out if rc == 0 else None


def preprocess_rgb8(rgb: np.ndarray, out_size: int, crop_pct: float,
                    mean, std) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w = rgb.shape[:2]
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    out = np.empty((out_size, out_size, 3), np.float32)
    rc = lib.adalog_preprocess_rgb8(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h, out_size,
        crop_pct, _fp(mean), _fp(std), _fp(out))
    return out if rc == 0 else None


def batch_load(paths: Sequence[str], out_size: int, crop_pct: float,
               mean, std, n_threads: int = 8) -> Optional[np.ndarray]:
    """Parallel load+decode+preprocess; failed images are zero-filled."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    out = np.empty((n, out_size, out_size, 3), np.float32)
    lib.adalog_batch_load(arr, n, out_size, crop_pct, _fp(mean), _fp(std),
                          _fp(out), n_threads)
    return out
