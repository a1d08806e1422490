"""Injection-layer (custom_vjp tap) and compressed-optimizer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from smart_quantization_tpu.compress import build_compressor
from smart_quantization_tpu.inject.policy import DEFAULT_POLICY, LayerKind, TapPolicy
from smart_quantization_tpu.inject.tap import compression_tap
from smart_quantization_tpu.optim.compressed import (
    OptimizerCompression,
    build_optimizer,
    compressed_optimizer_step,
    norm_param_mask,
)


class TestTap:
    def test_forward_compresses(self):
        c = build_compressor("bf16")
        x = jax.random.normal(jax.random.key(0), (256,)) * 1.001
        y, stats = compression_tap(x, jax.random.key(1), c)
        assert float(stats.ratio) == pytest.approx(2.0)
        # bf16 fake-quant changes values
        assert not np.array_equal(np.asarray(y), np.asarray(x))

    def test_forward_disabled_is_identity(self):
        c = build_compressor("bf16")
        x = jax.random.normal(jax.random.key(0), (256,))
        y, stats = compression_tap(x, jax.random.key(1), c, compress_forward=False)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
        assert float(stats.ratio) == 1.0

    def test_backward_compresses_cotangent(self):
        """Gradient maps through the tap are fake-quantized (straight-through)."""
        c = build_compressor("bf16", stochastic=False)

        def loss(x):
            y, _ = compression_tap(
                x, None, c, compress_forward=False, compress_backward=True
            )
            return jnp.sum(y * jnp.arange(1.0, 5.0) * 1.0009)

        g = jax.grad(loss)(jnp.ones((4,)))
        expected_raw = np.arange(1.0, 5.0) * 1.0009
        bf16 = np.asarray(expected_raw, dtype=jnp.bfloat16).astype(np.float32)
        np.testing.assert_allclose(np.asarray(g), bf16, rtol=0, atol=0)

    def test_backward_disabled_passes_gradient(self):
        c = build_compressor("fp8")

        def loss(x):
            y, _ = compression_tap(
                x, jax.random.key(0), c, compress_forward=False, compress_backward=False
            )
            return jnp.sum(y * 3.0)

        g = jax.grad(loss)(jnp.ones((8,)))
        np.testing.assert_allclose(np.asarray(g), 3.0)

    def test_backward_stats_via_token_grad(self):
        """The telemetry-token trick: grad of the loss w.r.t. the zero token
        is [orig_bits, new_bits] of the backward (gradient-map) compression —
        no host callbacks involved."""
        c = build_compressor("fp16", stochastic=False)

        def loss(x, tok):
            y, _ = compression_tap(
                x, None, c,
                compress_forward=False, compress_backward=True, bwd_token=tok,
            )
            return jnp.sum(y * 2.0)

        x = jnp.ones((64,))
        tok = jnp.zeros((2,), jnp.float32)
        g_x, g_tok = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, tok)
        np.testing.assert_allclose(np.asarray(g_x), 2.0)
        assert float(g_tok[0]) == 64 * 32  # orig bits
        assert float(g_tok[1]) == 64 * 16  # fp16 new bits

    def test_backward_stats_token_multiple_sites_sum(self):
        c = build_compressor("bf16", stochastic=False)

        def loss(x, tok):
            y1, _ = compression_tap(
                x, None, c, compress_forward=False, compress_backward=True,
                bwd_token=tok,
            )
            y2, _ = compression_tap(
                y1, None, c, compress_forward=False, compress_backward=True,
                bwd_token=tok,
            )
            return jnp.sum(y2)

        _, g_tok = jax.grad(loss, argnums=(0, 1))(
            jnp.ones((32,)), jnp.zeros((2,), jnp.float32)
        )
        # two tap sites share one token -> cotangents sum
        assert float(g_tok[0]) == 2 * 32 * 32
        assert float(g_tok[1]) == 2 * 32 * 16

    def test_under_jit(self):
        c = build_compressor("smart", use_pallas=False)

        @jax.jit
        def f(x, key):
            y, stats = compression_tap(x, key, c)
            return jnp.sum(y), stats.ratio

        s, r = f(jax.random.normal(jax.random.key(2), (512,)), jax.random.key(3))
        assert np.isfinite(float(s))
        assert 4.0 <= float(r) <= 32 / 6


class TestPolicy:
    def test_default_covers_reference_set(self):
        for k in (
            LayerKind.CONV,
            LayerKind.LINEAR,
            LayerKind.POOL,
            LayerKind.NORM,
            LayerKind.ACTIVATION,
            LayerKind.CONTAINER,
            LayerKind.BLOCK,
        ):
            assert DEFAULT_POLICY.should_tap(k)
        for k in (LayerKind.DROPOUT, LayerKind.PAD, LayerKind.LOSS):
            assert not DEFAULT_POLICY.should_tap(k)

    def test_custom(self):
        p = TapPolicy.of(LayerKind.CONV)
        assert p.should_tap("conv") and not p.should_tap("linear")


def tiny_params():
    return {
        "dense": {"kernel": jnp.ones((8, 8)) * 0.123, "bias": jnp.zeros((8,))},
        "bn_0": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))},
    }


def tiny_grads():
    return jax.tree.map(lambda p: jnp.full_like(p, 0.01), tiny_params())


class TestCompressedOptimizer:
    def test_norm_mask(self):
        mask = norm_param_mask(tiny_params())
        assert mask["bn_0"]["scale"] and mask["bn_0"]["bias"]
        assert not mask["dense"]["kernel"]

    def test_sgd_matches_plain_when_fp32(self):
        spec = build_optimizer("sgd", 0.1, momentum=0.9)
        params = tiny_params()
        state = spec.tx.init(params)
        comp = OptimizerCompression(compressor=build_compressor("fp32"))
        p2, s2, _ = compressed_optimizer_step(
            spec, params, tiny_grads(), state, jax.random.key(0), comp
        )
        # plain optax for comparison
        up, s_plain = spec.tx.update(tiny_grads(), spec.tx.init(params), params)
        p_plain = optax.apply_updates(params, up)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b)),
            p2,
            p_plain,
        )

    def test_weight_exemption(self):
        spec = build_optimizer("sgd", 0.0, momentum=0.0)  # lr=0: params unchanged
        params = tiny_params()
        state = spec.tx.init(params)
        comp = OptimizerCompression(
            compressor=build_compressor("fp8", stochastic=False),
            compress_gradients=False,
            compress_momentum=False,
        )
        exempt = norm_param_mask(params)
        p2, _, m = compressed_optimizer_step(
            spec, params, tiny_grads(), state, jax.random.key(0), comp,
            weight_exempt=exempt,
        )
        # bn params untouched; dense kernel quantized (0.123 not on fp8 grid)
        np.testing.assert_array_equal(
            np.asarray(p2["bn_0"]["scale"]), np.asarray(params["bn_0"]["scale"])
        )
        assert not np.array_equal(
            np.asarray(p2["dense"]["kernel"]), np.asarray(params["dense"]["kernel"])
        )
        assert "optimizer_weight" in m

    def test_adam_momentum_quantized_nu_positive(self):
        spec = build_optimizer("adam", 0.001)
        params = tiny_params()
        state = spec.tx.init(params)
        comp = OptimizerCompression(
            compressor=build_compressor("smart", use_pallas=False),
            compress_weights=False,
            compress_gradients=False,
        )
        grads = jax.tree.map(
            lambda p: jax.random.normal(jax.random.key(1), p.shape) * 0.1,
            params,
        )
        _, s2, m = compressed_optimizer_step(
            spec, params, grads, state, jax.random.key(2), comp
        )
        assert "optimizer_momentum" in m
        adam_state = s2[0]
        assert isinstance(adam_state, optax.ScaleByAdamState)
        for leaf in jax.tree.leaves(adam_state.nu):
            assert float(jnp.min(leaf)) >= 0.0  # all_positive clamp held

    def test_momentum_rowwise(self):
        """--momentum_rowwise: per-row stats bound the Adam noise
        amplification (BASELINE.md round-4 root cause).  A leaf with wildly
        heterogeneous rows must keep small-row momentum intact under
        row-wise quantization where per-tensor stats would flatten it."""
        spec = build_optimizer("adam", 0.001)
        # row 0: tiny gradients (1e-4); row 1: huge (1e2) — per-tensor sigma
        # is ~1e2, so row 0's mu quantizes to garbage; per-row keeps it
        params = {"emb": jnp.zeros((2, 64))}
        grads = {
            "emb": jnp.concatenate(
                [
                    1e-4 * (1 + jnp.arange(64, dtype=jnp.float32))[None, :] / 64,
                    1e2 * (1 + jnp.arange(64, dtype=jnp.float32))[None, :] / 64,
                ]
            )
        }
        state = spec.tx.init(params)

        def run(rowwise):
            comp = OptimizerCompression(
                compressor=build_compressor(
                    "smart", use_pallas=False, stochastic_rounding=False
                ),
                compress_weights=False,
                compress_gradients=False,
                momentum_rowwise=rowwise,
            )
            _, s2, m = compressed_optimizer_step(
                spec, params, grads, state, jax.random.key(0), comp
            )
            return s2[0].mu["emb"], m["optimizer_momentum"]

        mu_row, m_row = run(True)
        mu_tensor, m_tensor = run(False)
        true_mu = 0.1 * np.asarray(grads["emb"])
        # per-row: row 0 relative error stays small
        rel_row = np.abs(np.asarray(mu_row)[0] - true_mu[0]) / np.abs(true_mu[0])
        rel_tensor = (
            np.abs(np.asarray(mu_tensor)[0] - true_mu[0]) / np.abs(true_mu[0])
        )
        assert np.median(rel_row) < 0.2
        assert np.median(rel_tensor) > 0.5  # per-tensor flattens row 0
        # 64 bits/row stats overhead counted
        assert float(m_row[1]) > float(m_tensor[1])

    def test_momentum_log_nu(self):
        """--momentum_log_nu: nu is positive + heavy-tailed; the linear
        z-score grid clamps small entries to exact zero (removing Adam's
        denominator floor), while the log2-domain codec keeps uniform
        RELATIVE error and preserves exact zeros as zeros."""
        spec = build_optimizer("adam", 0.001)
        params = {"k": jnp.zeros((4, 64))}
        # grads spanning 4 decades per row + one all-zero row -> nu spans
        # 8 decades with exact zeros
        g = jnp.concatenate(
            [
                10.0 ** jnp.linspace(-3, 1, 64)[None, :],
                10.0 ** jnp.linspace(-2, 0, 64)[None, :],
                jnp.zeros((1, 64)),
                10.0 ** jnp.linspace(-1, 1, 64)[None, :],
            ]
        )
        grads = {"k": g}
        state = spec.tx.init(params)

        def run(log_nu):
            comp = OptimizerCompression(
                compressor=build_compressor(
                    "smart", use_pallas=False, stochastic_rounding=False
                ),
                compress_weights=False,
                compress_gradients=False,
                momentum_log_nu=log_nu,
            )
            _, s2, _ = compressed_optimizer_step(
                spec, params, grads, state, jax.random.key(0), comp
            )
            return np.asarray(s2[0].nu["k"])

        true_nu = 0.001 * np.asarray(g) ** 2
        nu_log = run(True)
        nu_lin = run(False)
        pos = true_nu > 0
        # exact zeros preserved; no positive entry collapses to zero
        assert np.all(nu_log[~pos] == 0.0)
        assert np.all(nu_log[pos] > 0.0)
        rel = np.abs(nu_log[pos] - true_nu[pos]) / true_nu[pos]
        assert np.median(rel) < 0.3
        # the linear grid destroys small entries (rounds them to 0 or
        # errors >> 100%)
        rel_lin = np.abs(nu_lin[pos] - true_nu[pos]) / true_nu[pos]
        assert (nu_lin[pos] == 0).mean() + (rel_lin > 1.0).mean() > 0.3

    def test_momentum_log_nu_rowwise(self):
        """--momentum_log_nu_rowwise: per-ROW masked log stats.  A narrow-
        spread row sharing a tensor with an 8-decade row gets far tighter
        buckets than the per-tensor log codec gives it; zeros stay exact and
        the 64 bits/row overhead is counted."""
        spec = build_optimizer("adam", 0.001)
        params = {"k": jnp.zeros((3, 64))}
        g = jnp.concatenate(
            [
                10.0 ** jnp.linspace(-4, 4, 64)[None, :],  # 8-decade row
                1.0 + 0.5 * jnp.linspace(0, 1, 64)[None, :],  # narrow row
                jnp.zeros((1, 64)),
            ]
        )
        grads = {"k": g}
        state = spec.tx.init(params)

        def run(rowwise):
            comp = OptimizerCompression(
                compressor=build_compressor(
                    "smart", use_pallas=False, stochastic_rounding=False
                ),
                compress_weights=False,
                compress_gradients=False,
                momentum_log_nu=True,
                momentum_log_nu_rowwise=rowwise,
            )
            _, s2, m = compressed_optimizer_step(
                spec, params, grads, state, jax.random.key(0), comp
            )
            return np.asarray(s2[0].nu["k"]), m["optimizer_momentum"]

        true_nu = 0.001 * np.asarray(g) ** 2
        nu_row, m_row = run(True)
        nu_tensor, m_tensor = run(False)
        # zeros exact, positives positive, in both variants
        assert np.all(nu_row[2] == 0.0) and np.all(nu_row[:2] > 0.0)
        pos1 = true_nu[1] > 0
        rel_row = np.abs(nu_row[1] - true_nu[1])[pos1] / true_nu[1][pos1]
        rel_tensor = (
            np.abs(nu_tensor[1] - true_nu[1])[pos1] / true_nu[1][pos1]
        )
        # the narrow row's buckets shrink by ~the spread ratio
        assert np.median(rel_row) < 0.02
        assert np.median(rel_row) < 0.3 * np.median(rel_tensor)
        # 64 bits/row stats overhead counted
        assert float(m_row[1]) > float(m_tensor[1])

    def test_momentum_skipped_when_sgd_no_momentum(self):
        spec = build_optimizer("sgd", 0.1, momentum=0.0)
        assert not spec.has_momentum
        params = tiny_params()
        comp = OptimizerCompression(compressor=build_compressor("bf16"))
        _, _, m = compressed_optimizer_step(
            spec, params, tiny_grads(), spec.tx.init(params), jax.random.key(0), comp
        )
        assert "optimizer_momentum" not in m

    def test_full_step_under_jit(self):
        spec = build_optimizer("adamw", 0.001, weight_decay=0.01)
        params = tiny_params()
        comp = OptimizerCompression(compressor=build_compressor("smart", use_pallas=False))
        exempt = norm_param_mask(params)

        @jax.jit
        def step(params, grads, state, key):
            return compressed_optimizer_step(
                spec, params, grads, state, key, comp, weight_exempt=exempt
            )

        state = spec.tx.init(params)
        p, s, m = step(params, tiny_grads(), state, jax.random.key(0))
        p, s, m = step(p, tiny_grads(), s, jax.random.key(1))
        for tag in ("optimizer_grad", "optimizer_weight", "optimizer_momentum"):
            assert tag in m
            orig, new = np.asarray(m[tag])
            assert orig > new > 0


class TestWeightAccumulator:
    """The reference's acc_quant full-precision accumulators
    (optimizer.py:63-67,81-85)."""

    def test_master_stays_full_precision(self):
        from smart_quantization_tpu.optim.compressed import (
            CompressedOptState,
            init_opt_state,
        )

        spec = build_optimizer("sgd", 0.1, momentum=0.0)
        comp = OptimizerCompression(
            compressor=build_compressor("fp8", stochastic=False),
            compress_gradients=False,
            compress_momentum=False,
            use_weight_accumulator=True,
        )
        params = {"w": jnp.full((64,), 0.1)}
        state = init_opt_state(spec, params, comp)
        grads = {"w": jnp.full((64,), 0.001)}
        # tiny updates vanish under fp8 weight quantization without a master
        # accumulator; with it they accumulate exactly
        p = params
        for i in range(8):
            p, state, _ = compressed_optimizer_step(
                spec, p, grads, state, jax.random.key(i), comp
            )
        assert isinstance(state, CompressedOptState)
        master = np.asarray(state.master["w"])
        np.testing.assert_allclose(master, 0.1 - 0.1 * 0.001 * 8, rtol=1e-5)
        # the exposed params are the quantized view of the master
        q = np.asarray(p["w"])
        assert not np.allclose(q, master)

    def test_without_accumulator_updates_vanish(self):
        spec = build_optimizer("sgd", 0.1, momentum=0.0)
        comp = OptimizerCompression(
            compressor=build_compressor("fp8", stochastic=False),
            compress_gradients=False,
            compress_momentum=False,
        )
        params = {"w": jnp.full((64,), 0.1)}
        state = spec.tx.init(params)
        grads = {"w": jnp.full((64,), 0.001)}
        p = params
        for i in range(4):
            p, state, _ = compressed_optimizer_step(
                spec, p, grads, state, jax.random.key(i), comp
            )
        # fp8 quantum at 0.1 is ~0.0039 >> lr*grad=1e-4: deterministic
        # rounding snaps back every step
        np.testing.assert_allclose(np.asarray(p["w"]), 0.09375, rtol=1e-6)
