"""Bit-packing tests: exact pack/unpack round trips and SmaQ packed codec."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smart_quantization_tpu.ops.pack import (
    PackSpec,
    pack_bits,
    smaq_pack,
    smaq_unpack,
    unpack_bits,
)
from smart_quantization_tpu.ops.smaq import SmaQParams


class TestPackBits:
    @pytest.mark.parametrize("bits", [1, 3, 6, 8, 13, 16, 32])
    def test_roundtrip_exact(self, bits):
        rng = np.random.RandomState(bits)
        n = 1000
        vals = rng.randint(0, 2**bits, size=n, dtype=np.uint64).astype(np.uint32)
        packed = pack_bits(jnp.asarray(vals), bits)
        assert packed.size == -(-n * bits // 32)
        out = unpack_bits(packed, bits, n)
        np.testing.assert_array_equal(np.asarray(out), vals)

    def test_density(self):
        n = 4096
        packed = pack_bits(jnp.ones((n,), jnp.uint32), 6)
        assert packed.size * 32 >= n * 6
        assert packed.size * 32 < n * 6 + 32  # no waste beyond word padding


class TestSmaQPacked:
    def test_roundtrip_error_vs_fake_quant(self):
        """The packed codec must match the fake-quant's error scale."""
        from smart_quantization_tpu.ops.smaq import smaq_quantize_dequantize

        params = SmaQParams(stochastic_rounding=False)
        spec = PackSpec(params=params)
        x = jax.random.normal(jax.random.key(0), (8192,)) * 2.0 + 0.5
        packed = smaq_pack(x, None, spec)
        y = smaq_unpack(packed, x.size, spec)
        y_fake, _ = smaq_quantize_dequantize(x, None, params)
        err_packed = float(jnp.mean((y - x) ** 2))
        err_fake = float(jnp.mean((y_fake - x) ** 2))
        # packed clamps outliers at 2.5 sigma (the fake path doesn't), so
        # allow modest slack
        assert err_packed < err_fake * 3 + 1e-4

    def test_real_memory_reduction(self):
        spec = PackSpec()
        n = 65536
        x = jax.random.normal(jax.random.key(1), (n,))
        packed = smaq_pack(x, jax.random.key(2), spec)
        actual_bits = (
            packed.main.size + packed.flags.size + packed.outliers.size
        ) * 32 + 64
        assert actual_bits <= spec.packed_bits(n) + 96
        ratio = n * 32 / actual_bits
        assert ratio > 3.0  # real (not simulated) compression achieved

    def test_outlier_overflow_degrades_gracefully(self):
        params = SmaQParams(stochastic_rounding=False)
        spec = PackSpec(params=params, outlier_capacity_frac=0.01)
        # heavy-tailed data: way more than 1% outliers
        x = jax.random.t(jax.random.key(3), df=2.0, shape=(4096,))
        packed = smaq_pack(x, None, spec)
        y = smaq_unpack(packed, x.size, spec)
        assert np.all(np.isfinite(np.asarray(y)))

    def test_under_jit(self):
        spec = PackSpec()

        @jax.jit
        def codec(x, key):
            packed = smaq_pack(x, key, spec)
            return smaq_unpack(packed, x.size, spec), packed.n_outliers

        x = jax.random.normal(jax.random.key(4), (2048,))
        y, n_out = codec(x, jax.random.key(5))
        assert y.shape == x.shape
        assert 0 < float(n_out) < x.size


class TestCompressedCheckpoint:
    def test_roundtrip_and_size(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from smart_quantization_tpu.ops.pack import PackSpec
        from smart_quantization_tpu.ops.smaq import SmaQParams
        from smart_quantization_tpu.train.checkpoint import (
            pack_tree,
            restore_compressed,
            save_compressed,
            tree_nbytes,
            unpack_tree,
        )

        state = {
            "w": jax.random.normal(jax.random.key(0), (64, 128)),
            "mu": jax.random.normal(jax.random.key(1), (64, 128)) * 0.01,
            "small": jnp.ones((3,)),
            "step": jnp.int32(7),
        }
        spec = PackSpec(params=SmaQParams(stochastic_rounding=False))
        packed = pack_tree(state, jax.random.key(2), spec)
        assert tree_nbytes(packed) < tree_nbytes(state) * 0.45
        restored = unpack_tree(packed, spec)
        assert int(restored["step"]) == 7
        np.testing.assert_array_equal(
            np.asarray(restored["small"]), np.asarray(state["small"])
        )
        err = np.abs(np.asarray(restored["w"]) - np.asarray(state["w"]))
        assert err.mean() < 0.05  # SmaQ 6/8 quantization error scale

        path = tmp_path / "ckpt"
        save_compressed(str(path), state, jax.random.key(3), spec)
        back = restore_compressed(str(path), spec)
        assert int(back["step"]) == 7
        assert back["w"].shape == (64, 128)
