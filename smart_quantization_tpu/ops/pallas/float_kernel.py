"""Fused float-format (exp/man) fake-quantization Pallas TPU kernel.

The jnp path (ops/float_format.py) is already elementwise-fused by XLA, but
its stochastic rounding draws bits with threefry — an extra full compute pass
per tensor.  This kernel uses the on-chip PRNG instead and keeps the whole
quantize at one HBM read + one HBM write, with the same integer-domain
semantics (mask-trick rounding, subnormals, saturation, the reference's
positive-max-only inf restoration)."""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smart_quantization_tpu.ops.float_format import (
    FloatFormat,
    _f32_bits,
    float_quantize,
)

_LANES = 1024
_MAX_BLOCK_ROWS = 512  # 2 MB blocks (see smaq_kernel.py)
_MIN_PALLAS_ELEMS = 8192
_INV_2_24 = float(2.0**-24)


def _kernel(
    seed_ref,
    x_ref,
    y_ref,
    *,
    fmt: FloatFormat,
    stochastic: bool,
    check_inf: bool,
):
    pid = pl.program_id(0)
    xf = x_ref[:]
    if stochastic:
        pltpu.prng_seed(seed_ref[0, 0] + pid)
        rand = pltpu.bitcast(pltpu.prng_random_bits(xf.shape), jnp.uint32)
    else:
        rand = None
    y_ref[:] = fp_round_block(
        xf, rand, fmt=fmt, stochastic=stochastic, check_inf=check_inf
    )


def fp_round_block(
    xf,
    rand,
    *,
    fmt: FloatFormat,
    stochastic: bool,
    check_inf: bool,
):
    """Round one VMEM block of fp32 values onto ``fmt``'s grid (the kernel
    body, reusable by other fused kernels, e.g. S2FP8).  ``rand`` is a
    uint32 random-bits array of ``xf.shape`` (only read when stochastic).

    All vector shifts use COMPILE-TIME-constant amounts — per-element
    variable shift amounts stall the mosaic compiler.  The normal range uses
    the integer mask trick with the constant drop count; the target-subnormal
    range (|x| < 2^emin) is handled in float arithmetic on a fixed grid,
    which is exact for e<=5-bit-exponent formats (their subnormal range lies
    inside normal fp32) and flushes like the hardware does for e8 formats."""
    bits = pltpu.bitcast(xf, jnp.uint32)
    sign = bits & jnp.uint32(0x80000000)
    mag = bits & jnp.uint32(0x7FFFFFFF)

    drop = 23 - fmt.man
    mask = jnp.uint32((1 << drop) - 1) if drop > 0 else jnp.uint32(0)

    if stochastic:
        r = rand & mask
        probs = pltpu.bitcast(rand >> 8, jnp.int32).astype(jnp.float32) * jnp.float32(
            _INV_2_24
        )
    else:
        if drop > 0:
            half = jnp.uint32(1 << (drop - 1))
            lsb = (mag >> drop) & jnp.uint32(1)
            r = half - jnp.uint32(1) + lsb
        else:
            r = jnp.uint32(0)
    rounded_mag = (mag + r) & ~mask  # exact on the normal range

    # subnormal grid (2^emin > |x| >= quantum): fixed quantum in float
    quantum = 2.0 ** (fmt.emin - fmt.man)
    inv_quantum_a = 2.0 ** min(-(fmt.emin - fmt.man), 100)
    inv_quantum_b = 2.0 ** max(-(fmt.emin - fmt.man) - 100, 0)
    t = jnp.abs(xf) * jnp.float32(inv_quantum_a) * jnp.float32(inv_quantum_b)
    if stochastic:
        # floor(t + u): same distribution as floored+(frac>u), fewer VPU ops
        q = jnp.floor(t + probs)
    else:
        q = jnp.round(t)  # round-half-even on the fixed grid
    y_sub = q * jnp.float32(quantum)
    sub_bits = pltpu.bitcast(y_sub, jnp.uint32) & jnp.uint32(0x7FFFFFFF)

    # |x| below the normal range of the format? (exponent compare, constant)
    emin_threshold_bits = jnp.uint32(_f32_bits(2.0**fmt.emin))
    is_sub = mag < emin_threshold_bits
    out_bits = jnp.where(is_sub, sub_bits, rounded_mag)

    maxv_bits = jnp.uint32(_f32_bits(fmt.max_value))
    out_bits = jnp.where(out_bits > maxv_bits, maxv_bits, out_bits)
    out_bits = jnp.where(mag == 0, jnp.uint32(0), out_bits)
    if check_inf:
        is_pos_max = (out_bits == maxv_bits) & (sign == jnp.uint32(0))
        out_bits = jnp.where(is_pos_max, jnp.uint32(0x7F800000), out_bits)
    out_bits = out_bits | sign
    nonfinite = (mag & jnp.uint32(0x7F800000)) == jnp.uint32(0x7F800000)
    out_bits = jnp.where(nonfinite, bits, out_bits)
    return pltpu.bitcast(out_bits, jnp.float32)


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _bucket_rows(rows: int) -> int:
    # power-of-two row buckets: one compile per bucket (see smaq_kernel)
    p = 8
    while p < rows:
        p *= 2
    return p


@functools.partial(
    jax.jit, static_argnames=("fmt", "stochastic", "check_inf", "interpret")
)
def float_quantize_fused(
    x: jax.Array,
    fmt: FloatFormat,
    key: jax.Array | None = None,
    *,
    stochastic: bool = True,
    check_inf: bool = True,
    interpret: bool = False,
    seed: jax.Array | None = None,
) -> jax.Array:
    orig_shape = x.shape
    n = x.size
    xf = x.astype(jnp.float32).reshape(-1)

    if seed is not None:
        seed = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    elif stochastic and key is not None:
        seed = jax.lax.bitcast_convert_type(
            jax.random.key_data(key).reshape(-1)[-1:], jnp.int32
        ).reshape(1, 1)
    else:
        seed = jnp.zeros((1, 1), jnp.int32)

    padded_n = _round_up(n, _LANES)
    rows = padded_n // _LANES
    padded_rows = _bucket_rows(rows)
    block_rows = min(_MAX_BLOCK_ROWS, padded_rows)
    pad = padded_rows * _LANES - n
    if pad:
        xf = jnp.pad(xf, (0, pad))
    x2d = xf.reshape(padded_rows, _LANES)

    kernel = functools.partial(
        _kernel, fmt=fmt, stochastic=stochastic, check_inf=check_inf
    )
    y2d = pl.pallas_call(
        kernel,
        grid=(padded_rows // block_rows,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((padded_rows, _LANES), jnp.float32),
        interpret=interpret,
    )(seed, x2d)
    return y2d.reshape(-1)[:n].reshape(orig_shape)


def _use_pallas() -> bool:
    if os.environ.get("SMAQ_DISABLE_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


def float_quantize_fused_or_reference(
    x: jax.Array,
    fmt: FloatFormat,
    key: jax.Array | None = None,
    *,
    stochastic: bool = True,
    check_inf: bool = True,
) -> jax.Array:
    if _use_pallas() and x.size >= _MIN_PALLAS_ELEMS:
        y = float_quantize_fused(
            x, fmt, key, stochastic=stochastic, check_inf=check_inf
        )
        return y.astype(x.dtype)
    return float_quantize(x, fmt, key, stochastic=stochastic, check_inf=check_inf)
