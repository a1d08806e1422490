"""Registry + encoder behavior tests (S2FP8, FP8/16/BF16, FP32, SmaQ wiring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smart_quantization_tpu.compress import (
    COMPRESSORS,
    SmaQ,
    build_compressor,
)
from smart_quantization_tpu.ops.s2fp8 import s2fp8_quantize_dequantize


class TestRegistry:
    def test_all_six_present(self):
        assert set(COMPRESSORS) == {"smart", "fp8", "s2fp8", "fp16", "bf16", "fp32"}

    def test_build_smart_flat_options(self):
        c = build_compressor("smart", num_bits_main=3, num_bits_outlier=5)
        assert isinstance(c, SmaQ)
        assert c.params.num_bits_main == 3
        assert c.params.num_bits_outlier == 5

    def test_fp16_precision_mode_sets_std_clamp(self):
        c = build_compressor("smart", precision=16)
        assert c.params.std_clamp_lo == 1e-4
        assert c.params.std_clamp_hi == 1e4

    def test_unknown_name(self):
        with pytest.raises(KeyError):
            build_compressor("zstd")


class TestEncoders:
    def setup_method(self):
        self.x = jax.random.normal(jax.random.key(0), (1024,)) * 2.0
        self.key = jax.random.key(1)

    def test_fp32_identity(self):
        c = build_compressor("fp32")
        y, stats = c(self.x, self.key)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(self.x))
        assert float(stats.ratio) == 1.0

    @pytest.mark.parametrize(
        "name,ratio", [("fp8", 4.0), ("fp16", 2.0), ("bf16", 2.0)]
    )
    def test_float_ratios(self, name, ratio):
        c = build_compressor(name)
        y, stats = c(self.x, self.key)
        assert float(stats.ratio) == pytest.approx(ratio)
        assert y.shape == self.x.shape

    def test_s2fp8_ratio_includes_overhead(self):
        c = build_compressor("s2fp8")
        _, stats = c(self.x, self.key)
        expected = (1024 * 32) / (1024 * 8 + 64)
        assert float(stats.ratio) == pytest.approx(expected)

    def test_s2fp8_preserves_signs_and_zeros(self):
        x = jnp.array([0.0, -1.5, 2.25, -0.003, 1e-20, 0.0], jnp.float32)
        y = s2fp8_quantize_dequantize(x, jax.random.key(2))
        y = np.asarray(y)
        assert y[0] == 0.0 and y[5] == 0.0
        assert y[1] < 0 and y[2] > 0 and y[3] < 0

    def test_s2fp8_accuracy_on_wide_range(self):
        """The squeeze makes tensors spanning many binades representable."""
        x = jnp.concatenate(
            [jax.random.normal(jax.random.key(3), (512,)) * s for s in (1e-4, 1.0, 1e4)]
        )
        y = s2fp8_quantize_dequantize(x, jax.random.key(4))
        rel = np.abs(np.asarray(y) - np.asarray(x)) / (np.abs(np.asarray(x)) + 1e-12)
        # e5m2 relative quantum is 2^-3 pre-squeeze; squeezing costs some
        # precision but everything must stay well within ~50% relative error
        assert np.median(rel) < 0.2

    def test_s2fp8_constant_tensor_guarded(self):
        x = jnp.full((256,), 2.0)
        y = s2fp8_quantize_dequantize(x, jax.random.key(5))
        assert np.all(np.isfinite(np.asarray(y)))

    def test_smaq_encoder_stats(self):
        c = build_compressor("smart")
        y, stats = c(self.x, self.key)
        assert y.shape == self.x.shape
        # ratio is data dependent, between 32/8=4 and 32/6=5.33
        assert 4.0 <= float(stats.ratio) <= 32 / 6

    def test_smaq_bn_scalar_params(self):
        c = build_compressor(
            "smart", use_batch_norm=True, bn_scalar_params=True, use_pallas=False
        )
        x = jax.random.normal(jax.random.key(6), (2, 4, 4, 8))
        gamma = jnp.linspace(0.5, 2.0, 8)
        beta = jnp.linspace(-1.0, 1.0, 8)
        y, _ = c(x, self.key, gamma=gamma, beta=beta)
        assert y.shape == x.shape
        assert np.all(np.isfinite(np.asarray(y)))

    def test_encoders_are_hashable_static(self):
        for name in COMPRESSORS:
            c = build_compressor(name)
            hash(c)  # usable as jit-static argument


class TestFusedS2FP8Kernel:
    """Pallas S2FP8 kernel vs the jnp reference (interpret mode on CPU).

    The kernel computes the squeeze as exp2(alpha*log2|x| + beta) where the
    jnp path uses jnp.power — identical math up to transcendental rounding,
    so a small fraction of elements may land one FP8 grid step apart."""

    def _cmp(self, x):
        from smart_quantization_tpu.ops.pallas.s2fp8_kernel import s2fp8_fused

        y_ref = np.asarray(
            s2fp8_quantize_dequantize(x, None, stochastic=False)
        )
        y_k = np.asarray(
            s2fp8_fused(x, None, stochastic=False, interpret=True)
        )
        return y_ref, y_k

    def test_matches_reference_normal(self):
        x = jax.random.normal(jax.random.key(0), (8192,)) * 3.0
        y_ref, y_k = self._cmp(x)
        # same FP8 grid points: adjacent e5m2 points differ by >=6%
        # relative, while transcendental noise (exp2/log2 vs pow; the scale
        # varies with the backend's libm, ~1e-7 to ~1.3e-5 measured) stays
        # far below that.  Allow a tiny fraction of borderline ties to land
        # one grid step apart.
        rel = np.abs(y_k - y_ref) / (np.abs(y_ref) + 1e-30)
        assert (rel < 1e-3).mean() > 0.98
        assert np.all(rel < 0.4)

    def test_signs_and_zeros(self):
        from smart_quantization_tpu.ops.pallas.s2fp8_kernel import s2fp8_fused

        x = jnp.concatenate([
            jnp.array([0.0, -0.0, -1.5, 2.25, -0.003, 1e-20], jnp.float32),
            jax.random.normal(jax.random.key(1), (4096,)),
        ])
        y = np.asarray(s2fp8_fused(x, None, stochastic=False, interpret=True))
        assert y[0] == 0.0 and y[1] == 0.0
        assert y[2] < 0 and y[3] > 0
        # squeezed magnitudes can underflow the FP8 grid to (signed) zero;
        # every surviving value must keep its sign
        nz = y[6:] != 0.0
        assert nz.mean() > 0.9
        assert np.all(np.sign(y[6:][nz]) == np.sign(np.asarray(x)[6:][nz]))

    def test_wide_range_accuracy(self):
        from smart_quantization_tpu.ops.pallas.s2fp8_kernel import s2fp8_fused

        x = jnp.concatenate(
            [jax.random.normal(jax.random.key(3), (512,)) * s
             for s in (1e-4, 1.0, 1e4)]
        )
        y = np.asarray(s2fp8_fused(x, None, stochastic=False, interpret=True))
        rel = np.abs(y - np.asarray(x)) / (np.abs(np.asarray(x)) + 1e-12)
        assert np.median(rel) < 0.2

    def test_constant_tensor_guarded(self):
        from smart_quantization_tpu.ops.pallas.s2fp8_kernel import s2fp8_fused

        x = jnp.full((8192,), 2.0)
        y = np.asarray(s2fp8_fused(x, None, stochastic=False, interpret=True))
        assert np.all(np.isfinite(y))

    def test_nonsquare_shape_roundtrip(self):
        from smart_quantization_tpu.ops.pallas.s2fp8_kernel import s2fp8_fused

        x = jax.random.normal(jax.random.key(4), (3, 17, 191))
        y = s2fp8_fused(x, None, stochastic=False, interpret=True)
        assert y.shape == x.shape and y.dtype == x.dtype
