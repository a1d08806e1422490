"""Fused S2FP8 (shifted-squeezed FP8) Pallas TPU kernel.

The jnp path (ops/s2fp8.py, mirroring
/root/reference/smart_compress/compress/s2fp8.py:27-48) costs XLA three HBM
passes: the log2-stats reduction, the squeeze+quantize, and threefry random
bits for stochastic rounding.  This kernel keeps the stats as one fused XLA
reduction (an unavoidable read pass — alpha/beta are exact full-tensor
statistics) and fuses squeeze -> FP8 round (reusing
``float_kernel.fp_round_block``) -> unsqueeze into a single pass with the
on-chip PRNG: 2 HBM reads + 1 write total.

The squeeze ``|x|^alpha * 2^beta`` is computed as
``exp2(alpha * log2 |x| + beta)`` (and its inverse likewise); zeros and
infinities are handled by explicit selects rather than relying on the VPU
transcendental approximations at the domain edges.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smart_quantization_tpu.ops.float_format import FP8_FORMAT
from smart_quantization_tpu.ops.pallas.float_kernel import (
    _bucket_rows,
    _round_up,
    fp_round_block,
)
from smart_quantization_tpu.ops.s2fp8 import s2fp8_quantize_dequantize

_LANES = 1024
_MAX_BLOCK_ROWS = 512  # 2 MB blocks (see smaq_kernel.py)
_MIN_PALLAS_ELEMS = 8192
_F32_INF = float("inf")


def _kernel(seed_ref, coef_ref, x_ref, y_ref, *, stochastic: bool,
            check_inf: bool):
    pid = pl.program_id(0)
    alpha = coef_ref[0, 0]
    beta = coef_ref[0, 1]
    inv_alpha = coef_ref[0, 2]

    xf = x_ref[:]
    bits = pltpu.bitcast(xf, jnp.uint32)
    sign_bits = bits & jnp.uint32(0x80000000)
    x_abs = pltpu.bitcast(bits & jnp.uint32(0x7FFFFFFF), jnp.float32)

    is_zero = x_abs == 0.0
    nonfinite = x_abs >= jnp.float32(_F32_INF)  # inf or nan magnitude
    # guard the transcendental inputs away from the domain edges
    safe_abs = jnp.where(is_zero | nonfinite, jnp.float32(1.0), x_abs)
    squeezed = jnp.exp2(alpha * jnp.log2(safe_abs) + beta)
    squeezed = jnp.where(is_zero, jnp.float32(0.0), squeezed)
    squeezed = jnp.where(nonfinite, x_abs, squeezed)

    if stochastic:
        pltpu.prng_seed(seed_ref[0, 0] + pid)
        rand = pltpu.bitcast(pltpu.prng_random_bits(xf.shape), jnp.uint32)
    else:
        rand = None
    t = fp_round_block(
        squeezed, rand, fmt=FP8_FORMAT, stochastic=stochastic,
        check_inf=check_inf,
    )

    t_zero = t == 0.0
    t_nonfin = t >= jnp.float32(_F32_INF)
    safe_t = jnp.where(t_zero | t_nonfin, jnp.float32(1.0), t)
    out = jnp.exp2((jnp.log2(safe_t) - beta) * inv_alpha)
    out = jnp.where(t_zero, jnp.float32(0.0), out)
    out = jnp.where(t_nonfin, t, out)
    y_ref[:] = pltpu.bitcast(
        pltpu.bitcast(out, jnp.uint32) | sign_bits, jnp.float32
    )


@functools.partial(
    jax.jit, static_argnames=("stochastic", "check_inf", "interpret")
)
def s2fp8_fused(
    x: jax.Array,
    key: jax.Array | None = None,
    *,
    stochastic: bool = True,
    check_inf: bool = True,
    interpret: bool = False,
    seed: jax.Array | None = None,
) -> jax.Array:
    """Fused-kernel S2FP8; same contract as ``s2fp8_quantize_dequantize``."""
    orig_dtype = x.dtype
    orig_shape = x.shape
    n = x.size
    xf = x.astype(jnp.float32).reshape(-1)

    # exact full-tensor squeeze statistics (one fused XLA reduction pass):
    # mean/max of log2|x| with zeros contributing 0 to BOTH (the reference
    # quirk, s2fp8.py:33-37), degenerate max==mean guarded to alpha=1
    x_abs = jnp.abs(xf)
    x_abs_log2 = jnp.where(x_abs == 0.0, x_abs, jnp.log2(x_abs))
    mu = jnp.mean(x_abs_log2)
    m = jnp.max(x_abs_log2)
    denom = m - mu
    safe_denom = jnp.where(denom == 0.0, jnp.float32(15.0), denom)
    alpha = 15.0 / safe_denom
    beta = -alpha * mu
    coefs = jnp.stack([alpha, beta, 1.0 / alpha]).reshape(1, 3)

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
        _kernel, stochastic=stochastic, check_inf=check_inf
    )
    y2d = pl.pallas_call(
        kernel,
        grid=(padded_rows // block_rows,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((padded_rows, _LANES), jnp.float32),
        interpret=interpret,
    )(seed, coefs, x2d)
    return y2d.reshape(-1)[:n].reshape(orig_shape).astype(orig_dtype)


def _use_pallas() -> bool:
    if os.environ.get("SMAQ_DISABLE_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


def s2fp8_fused_or_reference(
    x: jax.Array,
    key: jax.Array | None = None,
    *,
    stochastic: bool = True,
    check_inf: bool = True,
) -> jax.Array:
    """Dispatch to the fused TPU kernel when profitable, else the jnp path.

    Identical math up to transcendental rounding: the kernel computes the
    squeeze as exp2(alpha*log2|x| + beta) where the jnp path uses jnp.power;
    both land on the same FP8 grid values except for borderline ties."""
    if _use_pallas() and x.size >= _MIN_PALLAS_ELEMS:
        return s2fp8_fused(x, key, stochastic=stochastic, check_inf=check_inf)
    return s2fp8_quantize_dequantize(
        x, key, stochastic=stochastic, check_inf=check_inf
    )
