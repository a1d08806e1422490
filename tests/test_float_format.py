"""Golden/property tests for the parametric float quantizer (qtorch parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smart_quantization_tpu.ops.float_format import (
    BF16_FORMAT,
    FP8_FORMAT,
    FP16_FORMAT,
    FP32_FORMAT,
    FloatFormat,
    float_quantize,
)


def quantize_numpy_nearest(x, fmt):
    """Independent host-side golden model: snap to nearest representable."""
    x = np.asarray(x, np.float64)
    out = np.empty_like(x)
    for i, v in np.ndenumerate(x):
        if v == 0 or not np.isfinite(v):
            out[i] = v
            continue
        s = np.sign(v)
        a = abs(v)
        e = int(np.floor(np.log2(a)))
        e = max(e, fmt.emin)  # subnormal grid
        quantum = 2.0 ** (e - fmt.man)
        q = np.round(a / quantum)  # ties-to-even via numpy
        r = q * quantum
        if r >= 2.0 ** (e + 1) and e + 1 <= fmt.emax:
            pass  # rounded up into the next binade; still representable
        r = min(r, fmt.max_value)
        out[i] = s * r
    return out.astype(np.float32)


class TestFormats:
    def test_constants(self):
        assert FP8_FORMAT.max_value == 57344.0  # e5m2 (IEEE-style emax)
        assert FP16_FORMAT.max_value == 65504.0  # e5m10 == IEEE fp16 max
        assert BF16_FORMAT.emin == -126

    def test_fp32_identity(self):
        x = jnp.array([1.5, -2.75e-30, 3.14159e20, 1e-40, -0.0], jnp.float32)
        y = float_quantize(x, FP32_FORMAT, jax.random.key(0), check_inf=False)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    @pytest.mark.parametrize("fmt", [FP8_FORMAT, FP16_FORMAT, BF16_FORMAT])
    def test_nearest_matches_golden(self, fmt):
        rng = np.random.RandomState(0)
        x = np.concatenate(
            [
                rng.randn(256).astype(np.float32),
                (rng.randn(64) * 1e-6).astype(np.float32),
                (rng.randn(64) * 1e6).astype(np.float32),
                np.array([0.0, -0.0, 1.0, -1.0], np.float32),
            ]
        )
        y = float_quantize(
            jnp.asarray(x), fmt, None, stochastic=False, check_inf=False
        )
        golden = quantize_numpy_nearest(x, fmt)
        np.testing.assert_allclose(np.asarray(y), golden, rtol=0, atol=0)

    @pytest.mark.parametrize("fmt", [FP8_FORMAT, FP16_FORMAT, BF16_FORMAT])
    def test_stochastic_lands_on_grid(self, fmt):
        """Stochastic results must be exactly representable in the format."""
        x = jax.random.normal(jax.random.key(1), (4096,)) * 3.0
        y = float_quantize(x, fmt, jax.random.key(2), check_inf=False)
        # round-tripping through nearest must be a fixed point
        y2 = float_quantize(y, fmt, None, stochastic=False, check_inf=False)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))

    def test_stochastic_unbiased(self):
        """E[quantized] == x for values between grid points."""
        x = jnp.full((200_000,), 1.0 + 2.0**-4)  # halfway for e5m2 (man=2)
        y = float_quantize(x, FP8_FORMAT, jax.random.key(3), check_inf=False)
        mean = float(jnp.mean(y))
        assert abs(mean - float(x[0])) < 2e-3
        uniq = np.unique(np.asarray(y))
        np.testing.assert_allclose(uniq, [1.0, 1.25])

    def test_saturation(self):
        x = jnp.array([1e38, -1e38], jnp.float32)
        y = float_quantize(x, FP8_FORMAT, jax.random.key(0), check_inf=False)
        np.testing.assert_allclose(
            np.asarray(y), [FP8_FORMAT.max_value, -FP8_FORMAT.max_value]
        )

    def test_check_inf_restores_positive_max_only(self):
        """The reference restores only +max to +inf (quantization.py:195-199)."""
        x = jnp.array([1e38, -1e38], jnp.float32)
        y = float_quantize(x, FP8_FORMAT, jax.random.key(0), check_inf=True)
        assert np.isposinf(np.asarray(y)[0])
        assert np.asarray(y)[1] == -FP8_FORMAT.max_value

    def test_nan_inf_propagate(self):
        x = jnp.array([np.nan, np.inf, -np.inf], jnp.float32)
        y = float_quantize(x, FP8_FORMAT, jax.random.key(0), check_inf=False)
        y = np.asarray(y)
        assert np.isnan(y[0]) and np.isposinf(y[1]) and np.isneginf(y[2])

    def test_subnormal_grid(self):
        fmt = FloatFormat(exp=5, man=2)  # emin=-14, quantum 2^-16
        quantum = 2.0 ** (fmt.emin - fmt.man)
        x = jnp.array([quantum * 1.25, quantum * 2.5, quantum * 0.25], jnp.float32)
        y = float_quantize(x, fmt, None, stochastic=False, check_inf=False)
        np.testing.assert_allclose(
            np.asarray(y), [quantum, quantum * 2, 0.0], rtol=0, atol=0
        )

    def test_bf16_matches_native_cast_nearest(self):
        x = jax.random.normal(jax.random.key(7), (2048,))
        ours = float_quantize(x, BF16_FORMAT, None, stochastic=False, check_inf=False)
        native = x.astype(jnp.bfloat16).astype(jnp.float32)
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(native))


class TestFusedFloatKernel:
    """Pallas float kernel vs jnp reference (interpret mode on CPU)."""

    @pytest.mark.parametrize("fmt", [FP8_FORMAT, FP16_FORMAT, BF16_FORMAT])
    def test_deterministic_matches_reference(self, fmt):
        from smart_quantization_tpu.ops.pallas.float_kernel import (
            float_quantize_fused,
        )

        x = jnp.concatenate([
            jax.random.normal(jax.random.key(0), (8192,)) * 2.0,
            jax.random.normal(jax.random.key(1), (4096,)) * 1e-6,
            jnp.array([0.0, -0.0, 1e38, -1e38], jnp.float32),
        ])
        y_ref = float_quantize(x, fmt, None, stochastic=False, check_inf=True)
        y_k = float_quantize_fused(
            x, fmt, None, stochastic=False, check_inf=True, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(y_k), np.asarray(y_ref))
