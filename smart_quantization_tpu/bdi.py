"""Python binding for the native NNW-BDI library (ctypes).

Mirrors the reference's pyo3 extension API
(/root/reference/libbdi/bdi-python/src/lib.rs:98-190):
``CompressionBaseConfig``, ``CompressionConfig``, and
``replace_with_compressed_repr(config, numpy_u32_buffer, dest, scale,
zero_point)`` which compresses, immediately decompresses, and writes the
dequantized floats into the destination array (we take a numpy float32 array
instead of a raw pointer — same contract, memory-safe).

The shared library is built on demand with ``make`` under ``native/``.
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libbdi.so")
_lib = None


class _ConfigC(ctypes.Structure):
    _fields_ = [
        ("num_bases", ctypes.c_size_t),
        ("base_size", ctypes.c_size_t),
        ("delta_size", ctypes.c_size_t),
    ]


class _OptionsC(ctypes.Structure):
    _fields_ = [
        ("batch_size", ctypes.c_size_t),
        ("scale_factor_init", ctypes.c_size_t),
        ("scale_factor_base", ctypes.c_size_t),
        ("scale_factor_delta", ctypes.c_size_t),
        ("use_stochastic_rounding", ctypes.c_int),
        ("use_zero_compression", ctypes.c_int),
        ("use_randomized_base_selection", ctypes.c_int),
        ("seed", ctypes.c_uint64),
        ("num_threads", ctypes.c_int),
    ]


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.bdi_replace_with_compressed_repr.restype = ctypes.c_size_t
    lib.bdi_replace_with_compressed_repr.argtypes = [
        ctypes.POINTER(_OptionsC),
        ctypes.POINTER(_ConfigC),
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_float,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.bdi_compress_line_exact.restype = ctypes.c_size_t
    lib.bdi_compress_line_exact.argtypes = [
        ctypes.POINTER(_OptionsC),
        ctypes.POINTER(_ConfigC),
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_size_t,
    ]
    _lib = lib
    return lib


@dataclasses.dataclass
class CompressionBaseConfig:
    num_bases: int
    base_size: int
    delta_size: int
    name: str = ""


@dataclasses.dataclass
class CompressionConfig:
    base_configs: list
    batch_size: int = 64
    scale_factor_init: int = 0
    scale_factor_base: int = 0
    scale_factor_delta: int = 0
    use_randomized_base_selection: bool = True
    use_stochastic_rounding: bool = True
    use_zero_compression: bool = True
    seed: int = 0
    num_threads: int = 0


def _pack(config: CompressionConfig):
    opt = _OptionsC(
        config.batch_size,
        config.scale_factor_init,
        config.scale_factor_base,
        config.scale_factor_delta,
        int(config.use_stochastic_rounding),
        int(config.use_zero_compression),
        int(config.use_randomized_base_selection),
        config.seed,
        config.num_threads,
    )
    n_cfg = len(config.base_configs)
    cfgs = (_ConfigC * n_cfg)(
        *[_ConfigC(c.num_bases, c.base_size, c.delta_size)
          for c in config.base_configs]
    )
    return opt, cfgs, n_cfg


def replace_with_compressed_repr(
    config: CompressionConfig,
    buffer: np.ndarray,
    dest: np.ndarray,
    scale: float,
    zero_point: int,
):
    """Compress ``buffer`` (uint32), write dequantized floats into ``dest``
    (float32, same length).  Returns (compressed_bits, scheme_ids,
    (comp_ns, decomp_ns))."""
    lib = _load()
    buffer = np.ascontiguousarray(buffer, np.uint32)
    assert dest.dtype == np.float32 and dest.size == buffer.size
    opt, cfgs, n_cfg = _pack(config)
    n = buffer.size
    num_lines = -(-n // (config.batch_size or 64))
    scheme_ids = np.zeros(num_lines, np.int32)
    comp_ns = ctypes.c_uint64()
    decomp_ns = ctypes.c_uint64()
    bits = lib.bdi_replace_with_compressed_repr(
        ctypes.byref(opt),
        cfgs,
        n_cfg,
        buffer.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        n,
        dest.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(scale),
        zero_point,
        scheme_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(comp_ns),
        ctypes.byref(decomp_ns),
    )
    if bits == 0:
        raise RuntimeError("BDI compression failed")
    return int(bits), scheme_ids, (comp_ns.value, decomp_ns.value)


def compress_line_exact(config: CompressionConfig, line: np.ndarray) -> np.ndarray:
    """Deterministic (non-stochastic, first-fit base) single-line compression
    returning [bases..., deltas...] — the Rust unit-test helper contract
    (lib.rs:406-427)."""
    lib = _load()
    line = np.ascontiguousarray(line, np.uint32)
    opt, cfgs, n_cfg = _pack(config)
    out = np.zeros(line.size * 2 + 16, np.uint32)
    written = lib.bdi_compress_line_exact(
        ctypes.byref(opt),
        cfgs,
        n_cfg,
        line.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        line.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        out.size,
    )
    if written == 0:
        raise RuntimeError("BDI compression failed")
    return out[:written]
