"""ctypes binding for the C++ SmaQ HLS golden model (native/smaq_golden/)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libsmaq_golden.so")
_lib = None


def _load():
    global _lib
    if _lib is None:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        _lib = ctypes.CDLL(_LIB_PATH)
    return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def stats(data: np.ndarray, mode: int = 0) -> tuple[float, float]:
    """mode: 0 full one-pass, 1 range-std, 2 sixteen-sample."""
    lib = _load()
    data = np.ascontiguousarray(data, np.float32)
    mean = ctypes.c_float()
    std = ctypes.c_float()
    lib.smaq_golden_stats(_fptr(data), data.size, mode,
                          ctypes.byref(mean), ctypes.byref(std))
    return mean.value, std.value


def compress(data: np.ndarray, mean: float, std: float) -> np.ndarray:
    lib = _load()
    data = np.ascontiguousarray(data, np.float32)
    out = np.zeros(data.size, np.int32)
    lib.smaq_golden_compress(_fptr(data), data.size, ctypes.c_float(mean),
                             ctypes.c_float(std), _iptr(out))
    return out


def decompress(q: np.ndarray, mean: float, std: float) -> np.ndarray:
    lib = _load()
    q = np.ascontiguousarray(q, np.int32)
    out = np.zeros(q.size, np.float32)
    lib.smaq_golden_decompress(_iptr(q), q.size, ctypes.c_float(mean),
                               ctypes.c_float(std), _fptr(out))
    return out


def compress_bn(data, mean, std, bn_scalar, bn_shift):
    lib = _load()
    data = np.ascontiguousarray(data, np.float32)
    out = np.zeros(data.size, np.int32)
    lib.smaq_golden_compress_bn(_fptr(data), data.size, ctypes.c_float(mean),
                                ctypes.c_float(std), ctypes.c_float(bn_scalar),
                                ctypes.c_float(bn_shift), _iptr(out))
    return out


def decompress_bn(q, mean, std, bn_scalar, bn_shift):
    lib = _load()
    q = np.ascontiguousarray(q, np.int32)
    out = np.zeros(q.size, np.float32)
    lib.smaq_golden_decompress_bn(_iptr(q), q.size, ctypes.c_float(mean),
                                  ctypes.c_float(std),
                                  ctypes.c_float(bn_scalar),
                                  ctypes.c_float(bn_shift), _fptr(out))
    return out
