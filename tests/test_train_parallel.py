"""Train-loop, data, metrics, and multi-device parallel tests (8 CPU devices)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smart_quantization_tpu.compress import build_compressor
from smart_quantization_tpu.data.cifar import CIFAR10Data, augment, normalize
from smart_quantization_tpu.data.glue import GLUEData, TASK_NUM_LABELS
from smart_quantization_tpu.inject.tap import TapConfig
from smart_quantization_tpu.models.tiny import TinyCNN
from smart_quantization_tpu.optim.compressed import (
    OptimizerCompression,
    build_optimizer,
)
from smart_quantization_tpu.parallel.collectives import compressed_allreduce_mean
from smart_quantization_tpu.parallel.mesh import make_mesh
from smart_quantization_tpu.parallel.train_dp import (
    make_dp_train_step,
    replicate_state,
    shard_batch,
)
from smart_quantization_tpu.train.glue_metrics import glue_metrics, pearson, spearman
from smart_quantization_tpu.train.loop import TrainConfig, Trainer
from smart_quantization_tpu.train.metrics import MetricLogger
from smart_quantization_tpu.train.state import TrainState


class TestData:
    def test_cifar_synthetic_fallback(self):
        data = CIFAR10Data(batch_size=16)
        assert data.synthetic
        assert data.val_batch_size == 4  # bs // 4 (reference default)
        xb, yb = next(data.train_batches(0))
        assert xb.shape == (16, 32, 32, 3) and xb.dtype == np.uint8
        assert yb.shape == (16,)

    def test_augment_shapes_and_determinism(self):
        x = jnp.asarray(
            np.random.RandomState(0).randint(0, 255, (4, 32, 32, 3), np.uint8)
        )
        a1 = augment(x, jax.random.key(5))
        a2 = augment(x, jax.random.key(5))
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        assert a1.shape == x.shape

    def test_normalize_stats(self):
        x = jnp.full((2, 32, 32, 3), 128, jnp.uint8)
        z = normalize(x)
        assert np.all(np.abs(np.asarray(z)) < 1.0)

    def test_glue_synthetic(self):
        data = GLUEData(task="stsb", batch_size=8, max_input_length=32)
        assert data.is_regression and data.num_labels == 1
        batch = next(data.train_batches(0))
        assert batch["input_ids"].shape == (8, 32)
        assert batch["labels"].dtype == np.float32

    def test_glue_all_tasks_registered(self):
        assert len(TASK_NUM_LABELS) == 10
        for task in ("cola", "mnli", "wnli"):
            d = GLUEData(task=task, batch_size=4, max_input_length=16)
            b = next(d.train_batches(0))
            assert b["labels"].dtype == np.int32


class TestGlueMetrics:
    def test_pearson_spearman(self):
        a = np.array([1.0, 2.0, 3.0, 4.0])
        assert pearson(a, a * 2 + 1) == pytest.approx(1.0)
        assert spearman(a, np.array([1.0, 10.0, 100.0, 1000.0])) == pytest.approx(1.0)
        m = glue_metrics("stsb", a, a[::-1])
        assert m["pearson_spearman_mean"] == pytest.approx(-1.0)

    def test_classification_metrics(self):
        p = np.array([1, 0, 1, 1])
        l = np.array([1, 0, 0, 1])
        m = glue_metrics("mrpc", p, l)
        assert m["accuracy"] == 0.75
        m2 = glue_metrics("cola", p, l)
        assert -1 <= m2["matthews_correlation"] <= 1


class TestTrainerLoop:
    def _trainer(self, **cfg_kw):
        comp = build_compressor("smart", use_pallas=False)
        tap = TapConfig(compressor=comp)
        model = TinyCNN(num_classes=10, tap=tap)
        data = CIFAR10Data(batch_size=8)
        spec = build_optimizer("sgd", 0.05, momentum=0.9)
        cfg = TrainConfig(
            epochs=1, log_every=2, limit_train_batches=3, limit_val_batches=2,
            measure_compression_ratio=True, **cfg_kw,
        )
        return Trainer(
            model, data, spec,
            tap_cfg=tap,
            optim_comp=OptimizerCompression(compressor=comp),
            loss_compressor=comp,
            config=cfg,
            logger=MetricLogger(None),
        )

    def test_fit_and_evaluate(self):
        trainer = self._trainer()
        state = trainer.fit()
        assert int(state.step) == 3
        val = trainer.evaluate(state)
        assert "val_loss" in val and np.isfinite(val["val_loss"])
        ratios = trainer.ratio_acc.summary()
        assert "compression_ratio" in ratios
        assert 4.0 < ratios["compression_ratio"] < 5.4
        # backward (gradient-map) sizes now arrive via the telemetry-token
        # gradient (inject/tap.py) — host-callback-free, so present on every
        # backend
        assert trainer._bwd_tel_active
        assert ratios.get("orig_size_backward_autograd", 0) > 0
        assert "compression_ratio_backward_autograd" in ratios

    def test_nan_termination(self, tmp_path):
        """terminate_on_nan (reference: Lightning terminate_on_nan=True,
        util/train.py:170) must fire DETERMINISTICALLY: an inf-poisoned
        first batch NaNs the loss at step 1, the flag must be set, training
        must stop before completing the epoch, and no post-NaN checkpoint
        may be committed."""

        class _PoisonedData:
            """First training batch carries inf pixels; everything else
            delegates to the real data pipeline."""

            def __init__(self, inner):
                self._inner = inner

            def __getattr__(self, name):
                return getattr(self._inner, name)

            def train_batches(self, seed):
                for i, batch in enumerate(self._inner.train_batches(seed)):
                    if i == 0:
                        inputs, labels = batch
                        # raw CIFAR pixels are uint8; poison in float
                        inputs = np.asarray(inputs).astype(np.float32)
                        inputs[0] = np.inf
                        batch = (inputs, labels)
                    yield batch

        trainer = self._trainer(checkpoint_dir=str(tmp_path))
        trainer.cfg.terminate_on_nan = True
        trainer.cfg.log_every = 1  # drain (and check) after every step
        trainer.data = _PoisonedData(trainer.data)
        state = trainer.fit()
        assert trainer.nan_terminated is True
        assert int(state.step) < 3  # stopped mid-epoch, not ran to the end
        assert list(tmp_path.iterdir()) == []  # no post-NaN state committed

    def test_checkpoint_roundtrip(self, tmp_path):
        trainer = self._trainer(checkpoint_dir=str(tmp_path))
        state = trainer.fit()
        ckpts = list(tmp_path.iterdir())
        assert len(ckpts) == 1
        from smart_quantization_tpu.train.loop import restore_checkpoint

        restored = restore_checkpoint(str(ckpts[0]), jax.device_get(state))
        assert int(restored.step) == int(state.step)
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(restored.params)[0]),
            np.asarray(jax.tree.leaves(state.params)[0]),
        )

    def test_resume_continues_training(self, tmp_path):
        """--resume_from semantics: restore then keep fitting (the
        reference delegates resume to Lightning's checkpoint callbacks,
        SURVEY.md section 5)."""
        trainer = self._trainer(checkpoint_dir=str(tmp_path))
        state = trainer.fit()
        ckpt = next(iter(tmp_path.iterdir()))
        from smart_quantization_tpu.train.loop import restore_checkpoint

        trainer2 = self._trainer()
        template = trainer2.init_state(jax.random.key(0))
        restored = restore_checkpoint(str(ckpt), jax.device_get(template))
        state2 = trainer2.fit(restored)
        assert int(state2.step) == int(state.step) + 3


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
class TestParallel:
    def test_compressed_allreduce_matches_pmean(self):
        mesh = make_mesh(dp=8)
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        x = jax.random.normal(jax.random.key(0), (8, 256)) * 3.0

        def f(x):
            local = x.reshape(256)
            return compressed_allreduce_mean(
                {"g": local}, "data", None, bits=8
            )["g"]

        out = jax.jit(
            shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
                      check_vma=False)
        )(x)
        expected = jnp.mean(x, axis=0)
        got = np.asarray(out)[:256]
        # int8 quantization error per shard ~ max|x|/127
        err = np.abs(got - np.asarray(expected))
        assert err.max() < np.abs(np.asarray(x)).max() / 127 * 1.5

    def test_dp_train_step_runs_and_replicates(self):
        mesh = make_mesh(dp=8)
        comp = build_compressor("smart", use_pallas=False)
        tap = TapConfig(compressor=comp)
        model = TinyCNN(num_classes=10, tap=tap)
        spec = build_optimizer("sgd", 0.1, momentum=0.9)
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        variables = model.init(
            {"params": jax.random.key(0), "compress": jax.random.key(1)},
            x, train=True,
        )
        state = TrainState(
            jnp.int32(0), variables["params"],
            variables.get("batch_stats", {}), spec.tx.init(variables["params"]),
        )
        state = replicate_state(mesh, state)
        step = make_dp_train_step(
            model, spec, OptimizerCompression(compressor=comp), mesh
        )
        images = jnp.asarray(
            np.random.RandomState(0).randint(0, 255, (16, 32, 32, 3), np.uint8)
        )
        labels = jnp.asarray(np.random.RandomState(1).randint(0, 10, 16))
        images, labels = shard_batch(mesh, images, labels)
        state, metrics = step(state, images, labels, jax.random.key(2))
        assert np.isfinite(float(metrics["train_loss"]))
        assert int(state.step) == 1

    def test_dp_train_step_ratio_telemetry(self):
        """Forward sown stats + backward telemetry-token gradients flow out
        of the shard_map DP step as _ratio/ metrics (PARITY.md closed gap)."""
        mesh = make_mesh(dp=8)
        comp = build_compressor("smart", use_pallas=False)
        tap = TapConfig(compressor=comp)
        model = TinyCNN(num_classes=10, tap=tap)
        spec = build_optimizer("sgd", 0.1, momentum=0.9)
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        variables = model.init(
            {"params": jax.random.key(0), "compress": jax.random.key(1)},
            x, train=True,
        )
        tel_tpl = jax.tree.map(jnp.zeros_like, variables.get("telemetry", {}))
        assert jax.tree.leaves(tel_tpl), "taps must create telemetry tokens"
        state = TrainState(
            jnp.int32(0), variables["params"],
            variables.get("batch_stats", {}), spec.tx.init(variables["params"]),
        )
        state = replicate_state(mesh, state)
        step = make_dp_train_step(
            model, spec, OptimizerCompression(compressor=comp), mesh,
            measure_ratio=True, tel_tpl=tel_tpl,
        )
        images = jnp.asarray(
            np.random.RandomState(0).randint(0, 255, (16, 32, 32, 3), np.uint8)
        )
        labels = jnp.asarray(np.random.RandomState(1).randint(0, 10, 16))
        images, labels = shard_batch(mesh, images, labels)
        state, metrics = step(state, images, labels, jax.random.key(2))
        fwd = np.asarray(metrics["_ratio/forward_autograd"])
        bwd = np.asarray(metrics["_ratio/backward_autograd"])
        assert fwd[0] > 0 and bwd[0] > 0
        # SmaQ 6/8: global ratio in the reference's observed band
        assert 4.0 < fwd[0] / fwd[1] < 5.4
        assert 4.0 < bwd[0] / bwd[1] < 5.4
        # optimizer tags present and counted once (replicated state)
        ow = np.asarray(metrics["_ratio/optimizer_weight"])
        n_params = sum(l.size for l in jax.tree.leaves(state.params))
        assert ow[0] <= n_params * 32 + 1

    def test_fsdp_q_ratio_telemetry(self):
        from smart_quantization_tpu.parallel.train_fsdp_q import (
            make_fsdp_q_train_step,
            place_state,
            shard_batch as shard_batch_q,
        )

        mesh = make_mesh(dp=2, fsdp=4)
        comp = build_compressor("smart", use_pallas=False)
        tap = TapConfig(compressor=comp)
        model = TinyCNN(num_classes=10, tap=tap)
        spec = build_optimizer("sgd", 0.05, momentum=0.9)
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        variables = model.init(
            {"params": jax.random.key(0), "compress": jax.random.key(1)},
            x, train=True,
        )
        tel_tpl = jax.tree.map(jnp.zeros_like, variables.get("telemetry", {}))
        state = TrainState(
            jnp.int32(0), variables["params"],
            variables.get("batch_stats", {}), spec.tx.init(variables["params"]),
        )
        step = make_fsdp_q_train_step(
            model, spec, OptimizerCompression(compressor=comp), mesh, state,
            grad_bits=8, param_gather_bits=8,
            measure_ratio=True, tel_tpl=tel_tpl,
        )
        state = place_state(mesh, state)
        images = jnp.asarray(
            np.random.RandomState(0).randint(0, 255, (16, 32, 32, 3), np.uint8)
        )
        labels = jnp.asarray(np.random.RandomState(1).randint(0, 10, 16))
        images, labels = shard_batch_q(mesh, images, labels)
        state, metrics = step(state, images, labels, jax.random.key(2))
        fwd = np.asarray(metrics["_ratio/forward_autograd"])
        bwd = np.asarray(metrics["_ratio/backward_autograd"])
        assert fwd[0] > 0 and bwd[0] > 0
        assert 4.0 < fwd[0] / fwd[1] < 5.4

    def test_fsdp_sharding_helper(self):
        from smart_quantization_tpu.parallel.mesh import fsdp_sharding

        mesh = make_mesh(dp=2, fsdp=4)
        leaf = jax.ShapeDtypeStruct((128, 64), jnp.float32)
        s = fsdp_sharding(mesh, leaf)
        assert "fsdp" in str(s.spec)
        odd = jax.ShapeDtypeStruct((3, 5), jnp.float32)
        s2 = fsdp_sharding(mesh, odd)
        assert s2.spec == jax.sharding.PartitionSpec()

    def test_fsdp_train_step(self):
        from smart_quantization_tpu.parallel.train_fsdp import (
            make_fsdp_train_step,
            place_state,
        )

        mesh = make_mesh(dp=4, fsdp=2)
        comp = build_compressor("smart", use_pallas=False)
        tap = TapConfig(compressor=comp)
        model = TinyCNN(num_classes=10, tap=tap)
        spec = build_optimizer("sgd", 0.1, momentum=0.9)
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        variables = model.init(
            {"params": jax.random.key(0), "compress": jax.random.key(1)},
            x, train=True,
        )
        state = TrainState(
            jnp.int32(0), variables["params"],
            variables.get("batch_stats", {}), spec.tx.init(variables["params"]),
        )
        state = place_state(mesh, state)
        step = make_fsdp_train_step(
            model, spec, OptimizerCompression(compressor=comp), mesh
        )(state)
        from jax.sharding import NamedSharding, PartitionSpec as P

        bsh = NamedSharding(mesh, P("data"))
        images = jax.device_put(jnp.zeros((8, 32, 32, 3), jnp.uint8), bsh)
        labels = jax.device_put(jnp.zeros((8,), jnp.int32), bsh)
        state, metrics = step(state, images, labels, jax.random.key(2))
        assert np.isfinite(float(metrics["train_loss"]))
        assert int(state.step) == 1

    def test_compressed_psum_matches_pmean(self):
        from smart_quantization_tpu.parallel.collectives import (
            compressed_psum_mean,
        )
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        mesh = make_mesh(dp=8)
        x = jax.random.normal(jax.random.key(10), (8, 512)) * 2.0

        def f(x):
            local = x.reshape(512)
            return compressed_psum_mean({"g": local}, "data", None, bits=8)["g"]

        out = jax.jit(
            shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
                      check_vma=False)
        )(x)
        expected = np.asarray(jnp.mean(x, axis=0))
        got = np.asarray(out)[:512]
        # shared-scale int8/8-shards on the exact integer grid
        # [-floor(127/8), floor(127/8)]: error bound global_max / 15
        bound = float(jnp.max(jnp.abs(x))) / (127 // 8)
        assert np.abs(got - expected).max() <= bound * 1.01

    def test_compressed_psum_chunked_matches_pmean(self):
        """The scalable DP default (per-chunk scales, headroom grid) stays
        within the shared-scale error bound of the true mean."""
        from smart_quantization_tpu.parallel.collectives import (
            compressed_psum_mean_chunked,
        )
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        mesh = make_mesh(dp=8)
        # two leaves with very different magnitudes: per-chunk scales must
        # keep the small leaf's precision (the single-scale variant cannot)
        xa = jax.random.normal(jax.random.key(11), (8, 2048)) * 2.0
        xb = jax.random.normal(jax.random.key(12), (8, 1030)) * 1e-3

        def f(a, b):
            tree = {"a": a.reshape(2048), "b": b.reshape(1030)}
            out = compressed_psum_mean_chunked(tree, "data", None, bits=8)
            return out["a"], out["b"]

        oa, ob = jax.jit(
            shard_map(f, mesh=mesh, in_specs=(P("data"), P("data")),
                      out_specs=(P("data"), P("data")), check_vma=False)
        )(xa, xb)
        for x, o, n in ((xa, oa, 2048), (xb, ob, 1030)):
            expected = np.asarray(jnp.mean(x, axis=0))
            got = np.asarray(o)[:n]
            # headroom grid [-15, 15] per 1024-chunk; bound by chunk max / 15
            bound = float(jnp.max(jnp.abs(x))) / (127 // 8)
            assert np.abs(got - expected).max() <= bound * 1.01

    def test_dp_step_mode_selection(self):
        """auto resolves to psum at 8 devices and gather below; both modes
        run a finite step (VERDICT r4 weak #1)."""
        comp = build_compressor("smart", use_pallas=False)
        tap = TapConfig(compressor=comp)
        model = TinyCNN(num_classes=10, tap=tap)
        spec = build_optimizer("sgd", 0.1, momentum=0.9)
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        # host copies: the donated step invalidates device buffers (and the
        # replicated device_put aliases same-device shards), so each mode
        # materializes a FRESH device state from numpy
        variables = jax.device_get(model.init(
            {"params": jax.random.key(0), "compress": jax.random.key(1)},
            x, train=True,
        ))
        images = jnp.asarray(
            np.random.RandomState(0).randint(0, 255, (16, 32, 32, 3), np.uint8)
        )
        labels = jnp.asarray(np.random.RandomState(1).randint(0, 10, 16))
        results = {}
        for mode in ("gather", "psum", None):
            mesh = make_mesh(dp=8)
            params = jax.tree.map(jnp.asarray, variables["params"])
            state = TrainState(
                jnp.int32(0), params,
                jax.tree.map(jnp.asarray, variables.get("batch_stats", {})),
                spec.tx.init(params),
            )
            state = replicate_state(mesh, state)
            step = make_dp_train_step(
                model, spec, OptimizerCompression(compressor=comp), mesh,
                grad_allreduce_bits=None if mode is None else 8,
                grad_allreduce_mode=mode or "auto",
            )
            imgs, lbls = shard_batch(mesh, images, labels)
            st2, metrics = step(state, imgs, lbls, jax.random.key(2))
            assert np.isfinite(float(metrics["train_loss"]))
            results[mode] = jax.device_get(
                jax.tree.leaves(st2.params)[0]
            )
        # both quantized exchanges track the fp32-pmean step closely (same
        # keys everywhere else; only the gradient payload differs).  The
        # yardstick is the fp32 step's own update magnitude: int8 headroom
        # grid error <= max|g|/15 per element -> post-step deviation well
        # under the update itself.
        update = np.abs(
            np.asarray(results[None])
            - np.asarray(jax.tree.leaves(variables["params"])[0])
        ).max()
        for mode in ("gather", "psum"):
            diff = np.abs(np.asarray(results[mode]) - np.asarray(results[None]))
            assert diff.max() < 0.5 * update + 1e-7, (mode, diff.max(), update)
        import pytest

        with pytest.raises(ValueError):
            make_dp_train_step(
                model, spec, OptimizerCompression(compressor=comp),
                make_mesh(dp=8), grad_allreduce_mode="bogus",
            )

    def test_compressed_reduce_scatter_matches_fp32(self):
        from smart_quantization_tpu.parallel.collectives import (
            compressed_reduce_scatter_mean,
        )
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        mesh = make_mesh(dp=2, fsdp=4)
        # every device holds a full (16, 8) gradient; mean over all 8 devices,
        # scattered over fsdp along dim 0 -> local (4, 8) shard; gather the
        # shards back so layout reasoning stays trivial
        g = jax.random.normal(jax.random.key(3), (2, 4, 16, 8)) * 2.0

        def f(gl):
            local = gl.reshape(16, 8)
            part = compressed_reduce_scatter_mean(
                local, "fsdp", None, bits=8, scatter_dimension=0,
                sum_axis_name="data",
            )
            return jax.lax.all_gather(part, "fsdp", axis=0, tiled=True)

        out = jax.jit(
            shard_map(
                f, mesh=mesh,
                in_specs=P("data", "fsdp"),
                out_specs=P("data", None),
                check_vma=False,
            )
        )(g)
        expected_full = np.asarray(jnp.mean(g.reshape(8, 16, 8), axis=0))
        # out_specs P("data", None) concatenates the two data rows along
        # dim 0 -> (32, 8); split back into per-data-row gathered means
        full = np.asarray(out).reshape(2, 16, 8)
        bound = float(jnp.max(jnp.abs(g))) / (127 // 8)
        for d in range(2):
            assert np.abs(full[d] - expected_full).max() <= bound * 1.01

    def test_compressed_reduce_scatter_fp32_exact(self):
        """bits=None path in the train step == plain psum+scatter; here check
        the quantized op degrades to near-exact when values are tiny ints."""
        from smart_quantization_tpu.parallel.collectives import (
            compressed_reduce_scatter_mean,
        )
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        mesh2 = make_mesh(dp=4, fsdp=2)
        g = jnp.zeros((4, 2, 8, 8))
        out = jax.jit(
            shard_map(
                lambda g: compressed_reduce_scatter_mean(
                    g.reshape(8, 8), "fsdp", None, scatter_dimension=0,
                    sum_axis_name="data",
                ),
                mesh=mesh2, in_specs=P("data", "fsdp"),
                out_specs=P("data", "fsdp"), check_vma=False,
            )
        )(g)
        np.testing.assert_array_equal(np.asarray(out), 0.0)

    def test_compressed_all_gather_roundtrip(self):
        from smart_quantization_tpu.parallel.collectives import (
            compressed_all_gather,
        )
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        mesh = make_mesh(dp=1, fsdp=8)
        x = jax.random.normal(jax.random.key(7), (8, 16, 4))

        def f(x):
            local = x.reshape(16, 4)  # this device's shard (rows)
            full = compressed_all_gather(local, "fsdp", None, gather_axis=0)
            return full.reshape(1, 128, 4)

        # deterministic payloads (key=None) -> gathered copy identical on
        # every device, so the output is genuinely replicated
        out = jax.jit(
            shard_map(f, mesh=mesh, in_specs=P(None, "fsdp", None),
                      out_specs=P(None, None, None), check_vma=False)
        )(x.reshape(1, 8 * 16, 4))
        full_src = np.asarray(x.reshape(128, 4))
        got = np.asarray(out).reshape(128, 4)
        # per-chunk (1024) scales; each shard is 64 elems -> one chunk each
        err = np.abs(got - full_src)
        per_chunk_bound = np.abs(full_src).reshape(8, 64).max(axis=1) / 127
        assert (err.reshape(8, 64).max(axis=1) <= per_chunk_bound * 1.01).all()

    def test_fsdp_quantized_train_step(self):
        from smart_quantization_tpu.parallel.train_fsdp_q import (
            make_fsdp_q_train_step,
            place_state,
            shard_batch,
        )

        mesh = make_mesh(dp=2, fsdp=4)
        comp = build_compressor("smart", use_pallas=False)
        tap = TapConfig(compressor=comp)
        model = TinyCNN(num_classes=10, tap=tap)
        spec = build_optimizer("sgd", 0.05, momentum=0.9)
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        variables = model.init(
            {"params": jax.random.key(0), "compress": jax.random.key(1)},
            x, train=True,
        )
        state = TrainState(
            jnp.int32(0), variables["params"],
            variables.get("batch_stats", {}), spec.tx.init(variables["params"]),
        )
        step = make_fsdp_q_train_step(
            model, spec, OptimizerCompression(compressor=comp), mesh, state,
            grad_bits=8, param_gather_bits=8,
        )
        state = place_state(mesh, state)
        images = jnp.asarray(
            np.random.RandomState(0).randint(0, 255, (16, 32, 32, 3), np.uint8)
        )
        labels = jnp.asarray(np.random.RandomState(1).randint(0, 10, 16))
        images, labels = shard_batch(mesh, images, labels)
        for i in range(2):
            state, metrics = step(state, images, labels, jax.random.key(i))
            assert np.isfinite(float(metrics["train_loss"]))
        assert int(state.step) == 2
        # params stay finite and sharded over fsdp
        leaves = jax.tree.leaves(state.params)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    def test_fsdp_q_fp32_path_matches_dp(self):
        """grad_bits=None, param_gather_bits=None, fsdp=1: the fused path
        reduces to plain data-parallel; one step must match make_dp_train_step
        up to the (identical-key) stochastic compression noise."""
        from smart_quantization_tpu.parallel.train_fsdp_q import (
            make_fsdp_q_train_step,
            place_state,
            shard_batch as shard_batch_q,
        )

        mesh = make_mesh(dp=8, fsdp=1)
        comp = build_compressor("smart", use_pallas=False)
        tap = TapConfig(compressor=comp)
        model = TinyCNN(num_classes=10, tap=tap)
        spec = build_optimizer("sgd", 0.05, momentum=0.9)
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        variables = model.init(
            {"params": jax.random.key(0), "compress": jax.random.key(1)},
            x, train=True,
        )
        state0 = TrainState(
            jnp.int32(0), variables["params"],
            variables.get("batch_stats", {}), spec.tx.init(variables["params"]),
        )
        images = jnp.asarray(
            np.random.RandomState(0).randint(0, 255, (16, 32, 32, 3), np.uint8)
        )
        labels = jnp.asarray(np.random.RandomState(1).randint(0, 10, 16))

        stepq = make_fsdp_q_train_step(
            model, spec, OptimizerCompression(compressor=comp), mesh, state0,
            grad_bits=None, param_gather_bits=None,
        )
        sq = place_state(mesh, state0)
        iq, lq = shard_batch_q(mesh, images, labels)
        sq, mq = stepq(sq, iq, lq, jax.random.key(5))
        assert np.isfinite(float(mq["train_loss"]))
        assert int(sq.step) == 1

    def test_trainer_fsdp_integration(self):
        """Trainer routes to the fused FSDP path when the mesh has an fsdp
        axis > 1 (build-before-place ordering, batch sharded over both axes)."""
        comp = build_compressor("smart", use_pallas=False)
        tap = TapConfig(compressor=comp)
        model = TinyCNN(num_classes=10, tap=tap)
        # val batch = 32 // 4 = 8: must divide the 8-device mesh
        data = CIFAR10Data(batch_size=32)
        spec = build_optimizer("sgd", 0.05, momentum=0.9)
        cfg = TrainConfig(
            epochs=1, log_every=2, limit_train_batches=2, limit_val_batches=1,
        )
        trainer = Trainer(
            model, data, spec,
            tap_cfg=tap,
            optim_comp=OptimizerCompression(compressor=comp),
            config=cfg,
            logger=MetricLogger(None),
            mesh=make_mesh(dp=2, fsdp=4),
            grad_allreduce_bits=8,
            param_gather_bits=8,
        )
        assert trainer._fsdp_active()
        state = trainer.fit()
        assert int(state.step) == 2
        val = trainer.evaluate(state)
        assert np.isfinite(val["val_loss"])

    def test_bert_dp_trainer(self):
        """BERT fine-tuning under the DP mesh with quantized all-reduce
        (the reference runs BertModule under the same DDP as the image
        models, SURVEY.md row 28)."""
        from smart_quantization_tpu.data.glue import GLUEData
        from smart_quantization_tpu.models.bert import (
            BertConfig,
            BertForSequenceClassification,
        )
        from smart_quantization_tpu.train.bert_loop import BertTrainer
        from smart_quantization_tpu.train.loop import TrainConfig

        comp = build_compressor("smart", use_pallas=False)
        tap = TapConfig(compressor=comp)
        data = GLUEData(task="stsb", batch_size=16, max_input_length=32)
        model = BertForSequenceClassification(
            BertConfig.tiny(), num_labels=data.num_labels, tap=tap
        )
        # log_every > total steps: every step's ratio telemetry must still
        # be accumulated via the end-of-epoch drain (ADVICE r1: sizes from
        # off-cadence steps were silently dropped)
        cfg = TrainConfig(
            epochs=1, log_every=5, limit_train_batches=2, limit_val_batches=1,
            measure_compression_ratio=True,
        )
        trainer = BertTrainer(
            model, data, build_optimizer("adamw", 1e-4),
            optim_comp=OptimizerCompression(compressor=comp),
            tap_cfg=tap,
            config=cfg, logger=MetricLogger(None), task="stsb",
            mesh=make_mesh(dp=8), grad_allreduce_bits=8,
        )
        state = trainer.fit()
        assert int(state.step) == 2
        ratios = trainer.ratio_acc.summary()
        assert "compression_ratio" in ratios
        assert ratios.get("orig_size_backward_autograd", 0) > 0
        val = trainer.evaluate(state)
        assert np.isfinite(val["val_loss"])

    def test_compressed_psum_zero_exact(self):
        from smart_quantization_tpu.parallel.collectives import (
            compressed_psum_mean,
        )
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        mesh = make_mesh(dp=8)
        x = jnp.zeros((8, 256))

        def f(x):
            return compressed_psum_mean({"g": x.reshape(256)}, "data")["g"]

        out = jax.jit(
            shard_map(f, mesh=mesh, in_specs=P("data"), out_specs=P("data"),
                      check_vma=False)
        )(x)
        np.testing.assert_array_equal(np.asarray(out)[:256], 0.0)


class TestMetricLoggerTensorBoard:
    def test_writes_readable_tb_events(self, tmp_path):
        """The TestTubeLogger role (util/train.py:191-195) must produce
        TensorBoard-renderable output, not just JSONL (VERDICT r4 missing
        #5): scalars land in an events file under logdir/name with the
        reference's scalar names."""
        logger = MetricLogger(str(tmp_path), "tbrun")
        assert logger._tb is not None, "tensorboard ships in this image"
        logger.header({"git_commit": "deadbeef"})
        logger.log(1, {"train_loss": 2.5, "compression_ratio": 5.0},
                   echo=False)
        logger.log(2, {"train_loss": 2.25, "compression_ratio": 5.1},
                   echo=False)
        logger.close()

        from tensorboard.backend.event_processing.event_accumulator import (
            EventAccumulator,
        )

        acc = EventAccumulator(str(tmp_path / "tbrun"))
        acc.Reload()
        tags = set(acc.Tags()["scalars"])
        assert {"train_loss", "compression_ratio"} <= tags
        losses = acc.Scalars("train_loss")
        assert [e.step for e in losses] == [1, 2]
        assert losses[1].value == pytest.approx(2.25)
        # JSONL sidecar still written
        assert (tmp_path / "tbrun.metrics.jsonl").exists()

    def test_opt_out(self, tmp_path, monkeypatch):
        monkeypatch.setenv("SMAQ_DISABLE_TB", "1")
        logger = MetricLogger(str(tmp_path), "nope")
        assert logger._tb is None
        logger.log(1, {"train_loss": 1.0}, echo=False)
        logger.close()
        assert not (tmp_path / "nope").exists()
