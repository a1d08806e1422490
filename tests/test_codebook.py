"""Unified-codebook SmaQ storage (ops/codebook.py).

The load-bearing property: decode(encode(x, k)) must equal the fake-quant
path ``smaq_quantize_dequantize(x, k)`` BITWISE for every element whose
z-score lies within the extended storage range (storage_z_limit) — the packed representation then
changes nothing about training numerics, only the storage format.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smart_quantization_tpu.ops.codebook import (
    SmaQCodes,
    codebook_size,
    outlier_side_steps,
    real_bits,
    smaq_decode,
    smaq_encode,
    storage_z_limit,
    supports_codebook,
)
from smart_quantization_tpu.ops.smaq import SmaQParams, smaq_quantize_dequantize


@pytest.mark.parametrize(
    "bm,bo", [(6, 8), (3, 5), (3, 4), (2, 3), (3, 3), (8, 8)]
)
def test_matches_fake_quant_bitwise_within_threshold(bm, bo):
    params = SmaQParams(num_bits_main=bm, num_bits_outlier=bo)
    key = jax.random.key(42)
    x = jax.random.normal(jax.random.key(7), (4096,), jnp.float32) * 3.0 + 1.5

    y_fake, _ = smaq_quantize_dequantize(x, key, params)
    packed = smaq_encode(x, key, params)
    y_real = smaq_decode(packed, params)

    # elements beyond the extended storage range are clamped by the
    # codebook (documented deviation); everything else must be bit-identical
    z = (x - packed.mean) / packed.std
    in_range = np.asarray(jnp.abs(z) <= storage_z_limit(params))
    fake = np.asarray(y_fake)
    real = np.asarray(y_real)
    np.testing.assert_array_equal(real[in_range], fake[in_range])
    # clamped elements decode to the threshold boundary value
    assert np.all(np.isfinite(real[~in_range]))


def test_alphabet_fits_uint8_for_reference_sweeps():
    for bm, bo in [(6, 8), (3, 5), (3, 4), (2, 3), (3, 3), (8, 8)]:
        assert supports_codebook(SmaQParams(num_bits_main=bm, num_bits_outlier=bo))
    assert codebook_size(SmaQParams(num_bits_main=6, num_bits_outlier=8)) == 160
    assert codebook_size(SmaQParams(num_bits_main=8, num_bits_outlier=8)) == 256
    assert not supports_codebook(
        SmaQParams(num_bits_main=9, num_bits_outlier=8)
    )
    with pytest.raises(ValueError):
        smaq_encode(
            jnp.zeros((16,)),
            jax.random.key(0),
            SmaQParams(num_bits_main=9, num_bits_outlier=9),
        )


def test_real_storage_is_4x_smaller():
    x = jax.random.normal(jax.random.key(0), (64, 64), jnp.float32)
    packed = smaq_encode(x, jax.random.key(1), SmaQParams())
    assert packed.codes.dtype == jnp.uint8
    assert packed.codes.shape == x.shape
    assert real_bits(packed) == x.size * 8 + 64
    # device bytes: uint8 codes vs fp32 original
    assert packed.codes.nbytes * 4 == x.nbytes


def test_zero_tensor_roundtrips_exactly():
    x = jnp.zeros((256,), jnp.float32)
    packed = smaq_encode(x, jax.random.key(0), SmaQParams())
    y = smaq_decode(packed, SmaQParams())
    np.testing.assert_array_equal(np.asarray(y), 0.0)


def test_all_positive_clamps_at_zero():
    params = SmaQParams()
    x = jax.random.normal(jax.random.key(3), (2048,), jnp.float32) * 0.01
    packed = smaq_encode(x, jax.random.key(4), params)
    y = smaq_decode(packed, params, all_positive=True)
    assert float(jnp.min(y)) >= 0.0
    # matches the fake path's all_positive output where in range
    y_fake, _ = smaq_quantize_dequantize(
        x, jax.random.key(4), params, all_positive=True
    )
    z = (x - packed.mean) / packed.std
    in_range = np.asarray(jnp.abs(z) <= storage_z_limit(params))
    np.testing.assert_array_equal(np.asarray(y)[in_range], np.asarray(y_fake)[in_range])


def test_deterministic_rounding_mode():
    params = SmaQParams(stochastic_rounding=False)
    x = jax.random.normal(jax.random.key(5), (1024,), jnp.float32)
    y_fake, _ = smaq_quantize_dequantize(x, None, params)
    packed = smaq_encode(x, None, params)
    y_real = smaq_decode(packed, params)
    z = (x - packed.mean) / packed.std
    in_range = np.asarray(jnp.abs(z) <= storage_z_limit(params))
    np.testing.assert_array_equal(
        np.asarray(y_real)[in_range], np.asarray(y_fake)[in_range]
    )


def test_sampled_stats_mode():
    params = SmaQParams(use_sample_stats=True)
    key = jax.random.key(11)
    x = jax.random.normal(jax.random.key(12), (8192,), jnp.float32)
    y_fake, _ = smaq_quantize_dequantize(x, key, params)
    packed = smaq_encode(x, key, params)
    y_real = smaq_decode(packed, params)
    z = (x - packed.mean) / packed.std
    in_range = np.asarray(jnp.abs(z) <= storage_z_limit(params))
    np.testing.assert_array_equal(
        np.asarray(y_real)[in_range], np.asarray(y_fake)[in_range]
    )


def test_codes_survive_jit_and_tree_ops():
    params = SmaQParams()

    @jax.jit
    def roundtrip(x, key):
        packed = smaq_encode(x, key, params)
        return smaq_decode(packed, params), packed

    x = jax.random.normal(jax.random.key(1), (512,), jnp.float32)
    y, packed = roundtrip(x, jax.random.key(2))
    assert isinstance(packed, SmaQCodes)
    leaves = jax.tree.leaves(packed)
    assert len(leaves) == 3
    rel = float(jnp.max(jnp.abs(y - x)))
    # coarse sanity: grid error is tiny; tails are representable up to
    # ~3.64 sigma so even the max stays small
    assert rel < 1.5
