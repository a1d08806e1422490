"""Fused SmaQ quantize->dequantize Pallas TPU kernel.

The reference's hot loop applies the z-score quantizer to every eligible
layer output (SURVEY.md section 3.2); its FPGA accelerators
(/root/reference/hw/smaq.cpp, hw/smaq-with-bn.cpp) play the role this kernel
plays on TPU: one streaming pass that quantizes and immediately dequantizes a
tensor against per-tensor (mean, std) statistics.

Design:
- stats are computed by an XLA reduction (HBM-roofline already; sampled stats
  are O(1)), clamped/zero-guarded on the host side of the kernel;
- the kernel streams (BR, 1024) fp32 blocks HBM->VMEM, does the two-bucket
  z-score quantize + stochastic round + exact dequant on the VPU with the
  per-core PRNG, accumulates the data-dependent outlier count across the
  sequential grid, and streams the result back out: exactly one HBM read and
  one HBM write per element — the speed-of-light for fake quantization;
- zero-padding to block granularity is corrected out of the outlier count.

Bit-twiddling note: uniform probs come from the top 24 bits of the on-chip
PRNG so the float32 conversion is exact.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smart_quantization_tpu.ops.smaq import (
    SmaQParams,
    compute_stats,
    smaq_quantize_dequantize,
)

_LANES = 1024
_MAX_BLOCK_ROWS = 256
# below this, kernel launch overhead beats the fused win; use the jnp path
_MIN_PALLAS_ELEMS = 8192

_INV_2_24 = float(2.0**-24)


def _kernel(
    seed_ref,
    scalars_ref,
    x_ref,
    y_ref,
    count_ref,
    *,
    t: float,
    range_main: float,
    range_outlier: float,
    stochastic: bool,
    all_positive: bool,
    std_clamp_lo: float,
    std_clamp_hi: float,
):
    """Division-free SmaQ quantize->dequantize on one (BR, LANES) block.

    scalars_ref (SMEM, (1, 2)): raw [mean, std].  The zero-std guard, clamp,
    and reciprocal all happen here as scalar SMEM math — doing them as jnp
    host-side ops costs a swarm of tiny XLA kernels per call, which dominates
    runtime on dispatch-latency-bound backends.  The per-element path is
    division-free (VPU divides cost ~8x a multiply)."""
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _init():
        count_ref[0, 0] = jnp.float32(0.0)

    x = x_ref[:]
    mean = scalars_ref[0, 0]
    std = scalars_ref[0, 1]
    std = jnp.where(std == 0.0, jnp.float32(1.0), std)
    std = jnp.clip(std, jnp.float32(std_clamp_lo), jnp.float32(std_clamp_hi))
    a = jnp.float32(1.0) / std
    b = -mean * a

    z = x * a + b
    hi = z > t
    lo = z < -t
    outlier = hi | lo
    shift = jnp.where(hi, jnp.float32(-t), jnp.where(lo, jnp.float32(t), 0.0))
    scale = jnp.where(outlier, jnp.float32(range_outlier), jnp.float32(range_main))

    q = (z + shift) * scale
    floored = jnp.floor(q)
    if stochastic:
        pltpu.prng_seed(seed_ref[0, 0] + pid)
        rbits = pltpu.bitcast(pltpu.prng_random_bits(q.shape), jnp.uint32)
        # mosaic can't cast uint32->f32; route through int32 (top 24 bits)
        probs = pltpu.bitcast(rbits >> 8, jnp.int32).astype(jnp.float32) * jnp.float32(
            _INV_2_24
        )
        q = floored + ((q - floored) > probs).astype(jnp.float32)
    else:
        q = jnp.trunc(q)

    # y = (q / scale - shift) * std + mean, with reciprocals folded in
    inv_scale_std = jnp.where(
        outlier,
        std * jnp.float32(1.0 / range_outlier),
        std * jnp.float32(1.0 / range_main),
    )
    shift_term = jnp.where(
        hi, jnp.float32(t) * std, jnp.where(lo, jnp.float32(-t) * std, 0.0)
    )
    y = q * inv_scale_std + shift_term + mean
    if all_positive:
        y = jnp.maximum(y, 0.0)
    y_ref[:] = y
    count_ref[0, 0] += jnp.sum(outlier.astype(jnp.float32))


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


@functools.partial(
    jax.jit, static_argnames=("params", "all_positive", "interpret")
)
def smaq_fused(
    x: jax.Array,
    key: jax.Array | None,
    params: SmaQParams = SmaQParams(),
    *,
    all_positive: bool = False,
    interpret: bool = False,
    mean: jax.Array | None = None,
    std: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Fused-kernel SmaQ; same contract as ``smaq_quantize_dequantize``.
    Precomputed ``mean``/``std`` skip the stats pass."""
    orig_dtype = x.dtype
    n = x.size
    if n < params.min_size:
        return x, jnp.float32(n * 32)

    xf = x.astype(jnp.float32)
    if mean is None or std is None:
        mean, std = compute_stats(xf, params, key)

    if params.stochastic_rounding and key is not None:
        # seed the in-kernel PRNG from the raw key bits — calling threefry
        # (jax.random.bits) for one scalar costs a dispatch per tensor
        seed = (
            jax.lax.bitcast_convert_type(
                jax.random.key_data(key).reshape(-1)[-1:], jnp.int32
            ).reshape(1, 1)
        )
    else:
        seed = jnp.zeros((1, 1), jnp.int32)

    flat = xf.reshape(-1)
    padded_n = _round_up(n, _LANES)
    rows = padded_n // _LANES
    block_rows = min(_MAX_BLOCK_ROWS, _round_up(rows, 8))
    padded_rows = _round_up(rows, block_rows)
    pad = padded_rows * _LANES - n
    if pad:
        flat = jnp.pad(flat, (0, pad))
    x2d = flat.reshape(padded_rows, _LANES)

    grid = (padded_rows // block_rows,)
    kernel = functools.partial(
        _kernel,
        t=params.main_std_dev_threshold,
        range_main=params.range_main,
        range_outlier=params.range_outlier,
        stochastic=params.stochastic_rounding,
        all_positive=all_positive,
        std_clamp_lo=params.std_clamp_lo,
        std_clamp_hi=params.std_clamp_hi,
    )
    scalar_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    scalars2_spec = pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)
    stats2 = jnp.concatenate(
        [mean.reshape(1, 1), std.reshape(1, 1)], axis=1
    ).astype(jnp.float32)
    y2d, count = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            scalar_spec,
            scalars2_spec,
            pl.BlockSpec(
                (block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (block_rows, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            scalar_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((padded_rows, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(seed, stats2, x2d)

    n_outliers = count[0, 0]
    if pad:
        # padding zeros were counted as data; remove their contribution
        guarded_std = jnp.clip(
            jnp.where(std == 0.0, 1.0, std), params.std_clamp_lo, params.std_clamp_hi
        )
        pad_z = (0.0 - mean) / guarded_std
        pad_is_outlier = jnp.abs(pad_z) > params.main_std_dev_threshold
        n_outliers = n_outliers - jnp.float32(pad) * pad_is_outlier.astype(jnp.float32)

    y = y2d.reshape(-1)[:n].reshape(x.shape)
    new_size = (
        n_outliers * params.num_bits_outlier
        + (jnp.float32(n) - n_outliers) * params.num_bits_main
    )
    return y.astype(orig_dtype), new_size


def _use_pallas() -> bool:
    if os.environ.get("SMAQ_DISABLE_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


def smaq_fused_or_reference(
    x: jax.Array,
    key: jax.Array | None,
    params: SmaQParams = SmaQParams(),
    *,
    all_positive: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Dispatch to the fused TPU kernel when profitable, else the jnp path.

    Both paths implement identical math; they differ only in the PRNG stream
    driving stochastic rounding.
    """
    if _use_pallas() and x.size >= _MIN_PALLAS_ELEMS:
        return smaq_fused(x, key, params, all_positive=all_positive)
    return smaq_quantize_dequantize(x, key, params, all_positive=all_positive)
