"""Unified-codebook SmaQ storage: REAL compressed state in one byte/element.

The reference only *simulates* compression (quantize->dequantize in fp32,
/root/reference/smart_compress/compress/base.py:25-106) and logs the would-be
size.  This module stores SmaQ-quantized tensors for real, exploiting a
property of the two-bucket z-score code: once outliers are clamped at the
outlier threshold (t_out, default 2.5 sigma), the whole alphabet —

    main bucket:     2^(b_main - 1)            codes  (|z| <= t_main)
    outlier buckets: 2 * 2^(b_outlier - 2)     codes  (t_main < |z| <= t_out)

— has ``2^(b_main-1) + 2^(b_outlier-1)`` values, which is <= 256 for every
bit-width the reference sweeps (6/8 -> 160; 8/8 -> 256; 3/5, 3/4, 2/3, 3/3
far below).  So every element maps to ONE uint8 code and decode is pure
vector arithmetic — no gathers, no bit-unpacking, no data-dependent shapes —
which matters on TPU where random-index gathers are pathologically slow and
variable shifts don't legalize in Mosaic.

Compared to ``ops/pack.py`` (dense b_main-bit packing with a bounded outlier
side-table) this trades ~2 bits/element for: exact 4.0x real reduction vs
fp32, zero decode overhead beyond elementwise math, and bitwise equality
with the fake-quant path wherever |z| <= t_out.

Semantics vs the reference quantizer (smart.py:110-190): the reference never
clamps outliers — "values beyond the outlier threshold simply quantize to
larger integers and invert exactly" (documented quirk, SURVEY.md §7) — while
finite storage must.  To match as faithfully as possible, the spare uint8
codes beyond the nominal alphabet are spent EXTENDING the outlier grid: each
side gets ``H = (256 - 2^(bm-1))//2 - 1`` integer steps (>= the nominal
``2^(bo-2)-1`` whenever the alphabet fits), so clamping only bites at
``|z| > t_main + H/range_outlier`` — 3.64 sigma for 6/8 bits (~0.03% of a
gaussian) instead of the nominal 2.5 sigma (~1.2%).  Given the same PRNG
key, ``decode(encode(x, k)) == smaq_quantize_dequantize(x, k)`` bitwise for
every element within that extended range.

Size accounting: a ``SmaQCodes`` really occupies ``8 * n + 64`` bits on
device (codes + fp32 mean/std), independent of the outlier fraction — the
*real* ratio is exactly 4.0x, vs the simulated data-dependent
``n*b_main + outliers*(b_out-b_main)``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from smart_quantization_tpu.ops.rounding import round_to_grid
from smart_quantization_tpu.ops.smaq import SmaQParams, compute_stats


class SmaQCodes(NamedTuple):
    """A really-compressed tensor: one uint8 code per element + stats.

    ``codes`` keeps the original shape (decode is elementwise); ``mean`` and
    ``std`` are the guarded/clamped fp32 scalars used at encode time, so
    decode needs no re-derivation.  Checkpoints as-is with orbax (uint8
    leaves), crosses shard_map/pjit like any pytree.
    """

    codes: jax.Array  # uint8, original shape
    mean: jax.Array   # f32 scalar
    std: jax.Array    # f32 scalar (already guarded + clamped)


def codebook_size(params: SmaQParams) -> int:
    """Nominal alphabet size; must be <= 256 for uint8 storage."""
    return 2 ** (params.num_bits_main - 1) + 2 ** (params.num_bits_outlier - 1)


def supports_codebook(params: SmaQParams) -> bool:
    return codebook_size(params) <= 256


def outlier_side_steps(params: SmaQParams) -> int:
    """Max |q| storable per outlier side — the nominal ``2^(bo-2)-1`` grid
    extended into the spare uint8 codes (see module docstring)."""
    base = 2 ** (params.num_bits_main - 1)
    return (256 - base) // 2 - 1


def storage_z_limit(params: SmaQParams) -> float:
    """|z| beyond which the codebook clamps (the fake path never does)."""
    return (
        params.main_std_dev_threshold
        + outlier_side_steps(params) / params.range_outlier
    )


def smaq_encode(
    x: jax.Array, key: jax.Array | None, params: SmaQParams = SmaQParams()
) -> SmaQCodes:
    """Quantize ``x`` into unified uint8 codes (real storage).

    Key discipline matches ``smaq_quantize_dequantize`` exactly (one split
    into stats/rounding keys), so both paths round identically under the
    same key.
    """
    if not supports_codebook(params):
        raise ValueError(
            f"codebook needs 2^(bm-1)+2^(bo-1) <= 256, got "
            f"{codebook_size(params)} for {params.num_bits_main}/"
            f"{params.num_bits_outlier} bits"
        )
    if x.size < params.min_size:
        # the fake path passes sub-min_size tensors through untouched
        # (smart.py:123-128); encoding one here would silently quantize what
        # the fake path leaves alone — callers must keep such leaves fp32
        # (as optim/compressed._encode_tree does)
        raise ValueError(
            f"tensor of {x.size} elements is below min_size="
            f"{params.min_size}: the fake-quant path passes it through, so "
            "store it uncompressed instead of encoding"
        )
    flat = x.astype(jnp.float32)
    if key is not None:
        k_stats, k_round = jax.random.split(key)
    else:
        k_stats = k_round = None
    mean, std = compute_stats(flat, params, k_stats)
    std = jnp.where(std == 0.0, jnp.float32(1.0), std)
    std = jnp.clip(std, params.std_clamp_lo, params.std_clamp_hi)

    t = params.main_std_dev_threshold
    z = (flat - mean) / std
    hi = z > t
    lo = z < -t
    shift = jnp.where(hi, -t, 0.0) + jnp.where(lo, t, 0.0)
    scale = jnp.where(hi | lo, params.range_outlier, params.range_main).astype(
        jnp.float32
    )
    # exactly the fake path's grid (no z clamp!); the only storage clamp is
    # on the integer code below, at the extended capacity H
    q = round_to_grid((z + shift) * scale, k_round, params.stochastic_rounding)

    main_max = 2 ** (params.num_bits_main - 2) - 1
    h = outlier_side_steps(params)
    # guard non-finite q (inf inputs) before the int cast
    qi = jnp.clip(q, -2.0e9, 2.0e9).astype(jnp.int32)
    code_main = jnp.clip(qi, -main_max - 1, main_max) + (main_max + 1)
    base = 2 ** (params.num_bits_main - 1)
    qo = jnp.clip(qi, -h, h)
    code_hi = base + qo                  # q in [0, h]
    code_lo = base + (h + 1) - qo        # q in [-h, 0]
    codes = jnp.where(hi, code_hi, jnp.where(lo, code_lo, code_main))
    return SmaQCodes(codes.astype(jnp.uint8), mean, std)


def smaq_decode(
    packed: SmaQCodes,
    params: SmaQParams = SmaQParams(),
    *,
    all_positive: bool = False,
    dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Decode unified codes back to values — bitwise the fake-quant output.

    Reproduces the reference's dequant arithmetic order
    (``q / scale - shift``, then ``* std + mean``, smart.py:171-179) so the
    decoded tensor equals what ``smaq_quantize_dequantize`` would have
    returned for the same rounding draws.

    Stats may be scalars (single-chip layout), shape (1,) (one shard's slice
    of the FSDP layout, inside shard_map), or shape (k,) with k > 1 — the
    GLOBAL FSDP layout, where the codes hold k independent per-shard
    codebooks along the fsdp shard axis; that case decodes blockwise (used
    by eval/checkpoint paths that see the unsharded state).
    """
    mean = jnp.asarray(packed.mean)
    if mean.ndim == 1 and mean.shape[0] > 1:
        from smart_quantization_tpu.parallel.mesh import fsdp_shard_axis

        k = mean.shape[0]
        axis = fsdp_shard_axis(packed.codes.shape, k)
        pre = packed.codes.shape[:axis]
        la = packed.codes.shape[axis] // k
        post = packed.codes.shape[axis + 1:]
        blocks = packed.codes.reshape(pre + (k, la) + post)
        blocks = jnp.moveaxis(blocks, len(pre), 0)
        y = jax.vmap(
            lambda c, m, s: smaq_decode(
                SmaQCodes(c, m, s), params,
                all_positive=all_positive, dtype=dtype,
            )
        )(blocks, packed.mean, packed.std)
        return jnp.moveaxis(y, 0, len(pre)).reshape(packed.codes.shape)
    t = params.main_std_dev_threshold
    main_max = 2 ** (params.num_bits_main - 2) - 1
    h = outlier_side_steps(params)
    base = 2 ** (params.num_bits_main - 1)

    c = packed.codes.astype(jnp.int32)
    is_hi = (c >= base) & (c <= base + h)
    is_lo = c > base + h

    z_main = (c - (main_max + 1)).astype(jnp.float32) / jnp.float32(
        params.range_main
    )
    # hi: z = q/range_out - (-t); lo: z = q/range_out - (+t), q <= 0.
    # Division (not multiply-by-reciprocal) to match the fake-quant path's
    # ``q / scale`` bitwise.
    q_hi = (c - base).astype(jnp.float32)
    q_lo = -(c - (base + h + 1)).astype(jnp.float32)
    t_f = jnp.float32(t)
    r_out = jnp.float32(params.range_outlier)
    z = jnp.where(
        is_hi,
        q_hi / r_out + t_f,
        jnp.where(is_lo, q_lo / r_out - t_f, z_main),
    )
    y = z * packed.std + packed.mean
    if all_positive:
        y = jnp.maximum(y, 0.0)
    return y.astype(dtype)


def real_bits(packed: SmaQCodes) -> int:
    """Actual storage footprint in bits (static)."""
    return int(packed.codes.size) * 8 + 64
