"""Real bit-packed SmaQ buffers — actual memory reduction, not simulation.

The reference only *simulates* compression (quantize->dequantize in fp32) and
logs the would-be size; the achieved 6.7x memory reduction (README.md:25)
assumes a real packed representation.  This module provides it for TPU:
quantized SmaQ payloads packed into uint32 words with a static outlier
capacity (XLA needs static shapes).  A Gaussian tensor has ~31.7% of mass
beyond 1 sigma, so the capacity defaults to 40% of n; tensors whose outlier
count exceeds the capacity fall back to the main-bucket approximation for the
overflow elements — an accuracy cost, never a correctness one.

Packed layout (a pytree of arrays, checkpointable with orbax):
  - ``main``:    every element's main-bucket code, b_main bits, bit-packed
  - ``flags``:   1 bit/element outlier flag, bit-packed
  - ``outliers``: outlier-bucket codes for flagged elements (first
    ``capacity`` outliers in scan order), b_out bits, bit-packed
  - ``mean``, ``std``: fp32 scalars
Total bits ~= n*(b_main + 1) + capacity*b_out + 64: for 6/8 at 40% capacity
that is 10.2 bits/elem (3.1x); callers with better-behaved data can pass a
smaller capacity to approach n*b_main.

Everything is pure jnp (integer ops), jit/TPU-friendly; the bit packing uses
disjoint-bit segment sums, which XLA lowers to dense vector code.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from smart_quantization_tpu.ops.smaq import SmaQParams, compute_stats
from smart_quantization_tpu.ops.rounding import round_to_grid


def pack_bits(vals: jax.Array, bits: int) -> jax.Array:
    """Pack ``vals`` (uint32, each < 2^bits) into a dense uint32 word array."""
    n = vals.size
    total_bits = n * bits
    n_words = -(-total_bits // 32)
    positions = jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(bits)
    word_idx = (positions >> 5).astype(jnp.int32)
    offset = positions & jnp.uint32(31)
    lo = (vals << offset).astype(jnp.uint32)
    # the straddling high part (zero when the value fits in the word)
    hi_shift = jnp.uint32(32) - offset
    hi = jnp.where(
        offset == 0, jnp.uint32(0), vals >> jnp.minimum(hi_shift, jnp.uint32(31))
    )
    hi = jnp.where(hi_shift == 32, jnp.uint32(0), hi)
    words = jax.ops.segment_sum(lo, word_idx, num_segments=n_words + 1)
    words = words + jax.ops.segment_sum(hi, word_idx + 1, num_segments=n_words + 1)
    return words[:n_words].astype(jnp.uint32)


def unpack_bits(words: jax.Array, bits: int, n: int) -> jax.Array:
    """Inverse of :func:`pack_bits`."""
    positions = jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(bits)
    word_idx = (positions >> 5).astype(jnp.int32)
    offset = positions & jnp.uint32(31)
    padded = jnp.concatenate([words, jnp.zeros((1,), jnp.uint32)])
    lo = padded[word_idx] >> offset
    hi_shift = jnp.uint32(32) - offset
    hi = jnp.where(
        offset == 0,
        jnp.uint32(0),
        padded[word_idx + 1] << jnp.minimum(hi_shift, jnp.uint32(31)),
    )
    mask = jnp.uint32((1 << bits) - 1)
    return (lo | hi) & mask


class PackedSmaQ(NamedTuple):
    main: jax.Array       # packed b_main-bit codes, one per element
    flags: jax.Array      # packed 1-bit outlier flags
    outliers: jax.Array   # packed b_out-bit codes for the first C outliers
    mean: jax.Array
    std: jax.Array
    n_outliers: jax.Array  # actual count (for ratio telemetry)


@dataclasses.dataclass(frozen=True)
class PackSpec:
    params: SmaQParams = SmaQParams()
    outlier_capacity_frac: float = 0.40  # Gaussian |z|>1 is ~31.7%

    def capacity(self, n: int) -> int:
        return max(1, int(n * self.outlier_capacity_frac))

    def packed_bits(self, n: int) -> int:
        p = self.params
        return (
            n * (p.num_bits_main + 1)
            + self.capacity(n) * p.num_bits_outlier
            + 64
        )


def smaq_pack(
    x: jax.Array, key: jax.Array | None, spec: PackSpec = PackSpec()
) -> PackedSmaQ:
    p = spec.params
    flat = x.reshape(-1).astype(jnp.float32)
    n = flat.size
    if key is not None:
        k_stats, k_round = jax.random.split(key)
    else:
        k_stats = k_round = None
    mean, std = compute_stats(flat, p, k_stats)
    std = jnp.where(std == 0.0, 1.0, std)
    std = jnp.clip(std, p.std_clamp_lo, p.std_clamp_hi)

    t = p.main_std_dev_threshold
    z = (flat - mean) / std
    hi, lo = z > t, z < -t
    outlier = hi | lo
    shift = jnp.where(hi, -t, 0.0) + jnp.where(lo, t, 0.0)

    # main-bucket code for EVERY element (clamped into range) — elements
    # beyond outlier capacity decode from this approximation
    main_max = 2 ** (p.num_bits_main - 2) - 1
    qm = round_to_grid(
        jnp.clip(z, -t, t) * p.range_main, k_round, p.stochastic_rounding
    )
    qm = jnp.clip(qm, -main_max - 1, main_max)
    main_codes = (qm.astype(jnp.int32) + main_max + 1).astype(jnp.uint32)

    # outlier codes, clamped to the outlier threshold like a real encoder
    out_max = 2 ** (p.num_bits_outlier - 2) - 1
    zo = jnp.clip(
        z, -p.outlier_std_dev_threshold, p.outlier_std_dev_threshold
    )
    qo = round_to_grid(
        (zo + shift) * p.range_outlier,
        jax.random.fold_in(k_round, 1) if k_round is not None else None,
        p.stochastic_rounding,
    )
    qo = jnp.clip(qo, -out_max - 1, out_max)
    out_codes = (qo.astype(jnp.int32) + out_max + 1).astype(jnp.uint32)

    # gather the first `capacity` outliers in scan order
    cap = spec.capacity(n)
    order = jnp.cumsum(outlier.astype(jnp.int32)) - 1  # slot per outlier
    slot = jnp.where(outlier & (order < cap), order, cap)
    gathered = jnp.zeros((cap + 1,), jnp.uint32).at[slot].set(out_codes)[:cap]

    return PackedSmaQ(
        main=pack_bits(main_codes, p.num_bits_main),
        flags=pack_bits(outlier.astype(jnp.uint32), 1),
        outliers=pack_bits(gathered, p.num_bits_outlier),
        mean=mean,
        std=std,
        n_outliers=jnp.sum(outlier).astype(jnp.float32),
    )


def smaq_unpack(
    packed: PackedSmaQ, n: int, spec: PackSpec = PackSpec()
) -> jax.Array:
    p = spec.params
    t = p.main_std_dev_threshold
    main_max = 2 ** (p.num_bits_main - 2) - 1
    out_max = 2 ** (p.num_bits_outlier - 2) - 1
    cap = spec.capacity(n)

    main_codes = unpack_bits(packed.main, p.num_bits_main, n)
    flags = unpack_bits(packed.flags, 1, n).astype(bool)
    out_codes = unpack_bits(packed.outliers, p.num_bits_outlier, cap)

    z_main = (main_codes.astype(jnp.int32) - (main_max + 1)).astype(
        jnp.float32
    ) / p.range_main

    order = jnp.cumsum(flags.astype(jnp.int32)) - 1
    in_cap = flags & (order < cap)
    padded_out = jnp.concatenate([out_codes, jnp.zeros((1,), jnp.uint32)])
    code = padded_out[jnp.where(in_cap, order, cap)]
    qo = code.astype(jnp.int32) - (out_max + 1)
    # the outlier's side comes from the main code (clamped to exactly +-t for
    # outliers), since qo == 0 is side-ambiguous
    side = jnp.where(z_main >= 0, 1.0, -1.0)
    z_out = qo.astype(jnp.float32) / p.range_outlier + side * t

    z = jnp.where(in_cap, z_out, z_main)
    return (z * packed.std + packed.mean).reshape(-1)[:n]
