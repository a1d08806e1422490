"""BERT fine-tuning loop (GLUE / IMDB).

Plays the role of the reference's BertModule + Lightning trainer
(/root/reference/smart_compress/models/bert.py:10-73): regression (MSE) head
for STSB vs cross-entropy otherwise (bert.py:53-70), GLUE metrics on the
validation split, compression wired exactly as in the image path.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from smart_quantization_tpu.models.bert import (
    BertConfig,
    BertForSequenceClassification,
    load_pretrained_params,
)
from smart_quantization_tpu.optim.compressed import (
    compressed_optimizer_step,
    init_opt_state,
    norm_param_mask,
)
from smart_quantization_tpu.train.glue_metrics import glue_metrics
from smart_quantization_tpu.train.loop import cross_entropy
from smart_quantization_tpu.train.metrics import MetricLogger, RatioAccumulator
from smart_quantization_tpu.train.state import TrainState


def bert_loss(logits, labels, is_regression: bool):
    if is_regression:
        return jnp.mean((logits[:, 0] - labels) ** 2)
    return cross_entropy(logits, labels)


class BertTrainer:
    def __init__(self, model, data, spec, *, optim_comp, loss_compressor=None,
                 config, logger=None, task: str = "stsb",
                 mesh=None, grad_allreduce_bits: int | None = 8):
        self.model = model
        self.data = data
        self.spec = spec
        self.optim_comp = optim_comp
        self.loss_compressor = loss_compressor
        self.cfg = config
        self.logger = logger or MetricLogger(None)
        self.task = task
        self.is_regression = getattr(data, "is_regression", task == "stsb")
        self.ratio_acc = RatioAccumulator()
        self._train_step = None
        self._eval_step = None
        self.nan_terminated = False
        # data-parallel mesh (the reference fine-tunes BERT under the same
        # Lightning DDP as the image models, SURVEY.md row 28); gradients
        # ride the quantized all-reduce unless grad_allreduce_bits is None
        self.mesh = mesh
        self.grad_allreduce_bits = grad_allreduce_bits
        if optim_comp.packed_weights:
            raise NotImplementedError(
                "--packed_weights is wired for the image Trainer only; BERT "
                "supports --packed_momentum (mu+nu dominate AdamW state)"
            )

    def init_state(self, key: jax.Array, pretrained_params=None) -> TrainState:
        L = self.data.max_input_length
        sample = {
            "input_ids": jnp.zeros((2, L), jnp.int32),
            "attention_mask": jnp.ones((2, L), jnp.int32),
            "token_type_ids": jnp.zeros((2, L), jnp.int32),
        }
        k_param, k_comp, k_drop = jax.random.split(key, 3)
        variables = self.model.init(
            {"params": k_param, "compress": k_comp, "dropout": k_drop},
            sample["input_ids"],
            sample["attention_mask"],
            sample["token_type_ids"],
            train=True,
        )
        params = variables["params"]
        if pretrained_params is not None:
            # graft pretrained encoder weights over the fresh init
            params = {**params, **pretrained_params}
        opt_state = (
            init_opt_state(self.spec, params, self.optim_comp)
            if self.optim_comp.packed_momentum
            else self.spec.tx.init(params)
        )
        return TrainState(jnp.int32(0), params, {}, opt_state)

    def _telemetry_template(self):
        """Zero 'telemetry' collection for the backward-size telemetry-token
        trick (inject/tap.py) — None when ratio measurement is off or the
        model has no tapped modules."""
        if not self.cfg.measure_compression_ratio:
            return None
        L = self.data.max_input_length
        ids = jnp.zeros((2, L), jnp.int32)
        shapes = jax.eval_shape(
            lambda rngs: self.model.init(
                rngs, ids, jnp.ones((2, L), jnp.int32), ids, train=True
            ),
            {
                "params": jax.random.key(0),
                "compress": jax.random.key(1),
                "dropout": jax.random.key(2),
            },
        )
        tpl = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes.get("telemetry", {})
        )
        return tpl if jax.tree.leaves(tpl) else None

    def build_train_step(self):
        tel_tpl = self._telemetry_template()

        def train_step(state: TrainState, batch, key):
            # per-step randomness from the constant base key + on-device
            # step counter (no host-side key split per step)
            key = jax.random.fold_in(key, state.step)
            k_fwd, k_drop, k_opt, k_loss = jax.random.split(key, 4)
            return self._step_body(
                state, batch, k_fwd, k_drop, k_opt, k_loss, tel_tpl,
            )

        if self.mesh is not None:
            return self._build_dp_train_step(tel_tpl)
        return jax.jit(train_step, donate_argnums=(0,))

    def _build_dp_train_step(self, tel_tpl):
        """shard_map DP step: batch sharded over 'data', params replicated,
        gradients exchanged with the quantized all-reduce
        (parallel/collectives.py) — the BERT equivalent of
        parallel/train_dp.py."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from smart_quantization_tpu.parallel.collectives import (
            compressed_allreduce_mean,
        )

        bits = self.grad_allreduce_bits

        def local_step(state: TrainState, batch, key):
            dev = jax.lax.axis_index("data")
            key = jax.random.fold_in(key, state.step)
            k_fwd, k_drop = jax.random.split(jax.random.fold_in(key, dev))
            # shared keys: replicated params must stay bit-identical
            k_opt, k_col, k_loss = jax.random.split(
                jax.random.fold_in(key, 0x0FF1CE), 3
            )
            new_state, metrics = self._step_body(
                state, batch, k_fwd, k_drop, k_opt, k_loss, tel_tpl,
                grad_reduce=lambda g: (
                    jax.lax.pmean(g, "data")
                    if bits is None
                    else compressed_allreduce_mean(g, "data", k_col, bits=bits)
                ),
            )
            out = {}
            for k, v in metrics.items():
                if k.startswith("_ratio/") and not k.startswith(
                    "_ratio/optimizer"
                ):
                    # distinct data per device -> global bits are the sum;
                    # optimizer sizes are replicated, count once
                    out[k] = jax.lax.psum(v, "data")
                elif k.startswith("_ratio/"):
                    out[k] = v
                else:
                    out[k] = jax.lax.pmean(v, "data")
            return new_state, out

        batch_spec = {
            k: P("data")
            for k in ("input_ids", "attention_mask", "token_type_ids", "labels")
        }
        sharded = shard_map(
            local_step,
            mesh=self.mesh,
            in_specs=(P(), batch_spec, P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(0,))

    def _step_body(self, state, batch, k_fwd, k_drop, k_opt, k_loss, tel_tpl,
                   grad_reduce=None):
        def loss_fn(params, telemetry):
            # mutable=False (not []) so flax returns bare logits
            mutable = (
                ["compression_stats"]
                if self.cfg.measure_compression_ratio
                else False
            )
            variables = {"params": params}
            if telemetry is not None:
                variables["telemetry"] = telemetry
            out = self.model.apply(
                variables,
                batch["input_ids"],
                batch["attention_mask"],
                batch["token_type_ids"],
                train=True,
                rngs={"compress": k_fwd, "dropout": k_drop},
                mutable=mutable,
            )
            logits, mut = out if mutable else (out, {})
            loss = bert_loss(logits, batch["labels"], self.is_regression)
            if self.cfg.compress_loss and self.loss_compressor is not None:
                loss_q, _ = self.loss_compressor(loss[None], k_loss)
                loss = loss_q[0]
            return loss, (logits, mut)

        if tel_tpl is not None:
            (loss, (logits, mut)), (grads, tel_grads) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(state.params, tel_tpl)
        else:
            (loss, (logits, mut)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, None)
            tel_grads = None
        if grad_reduce is not None:
            grads = grad_reduce(grads)
        exempt = norm_param_mask(state.params)
        params, opt_state, opt_metrics = compressed_optimizer_step(
            self.spec, state.params, grads, state.opt_state, k_opt,
            self.optim_comp, weight_exempt=exempt,
        )
        new_state = TrainState(state.step + 1, params, {}, opt_state)
        metrics = {"train_loss": loss}
        if self.cfg.measure_compression_ratio:
            from smart_quantization_tpu.train.metrics import fold_sown_stats

            for tag, tot in fold_sown_stats(
                mut.get("compression_stats", {})
            ).items():
                metrics[f"_ratio/{tag}"] = tot
            for tag, pair in opt_metrics.items():
                metrics[f"_ratio/{tag}"] = pair
            if tel_grads is not None:
                pairs = jax.tree.leaves(tel_grads)
                metrics["_ratio/backward_autograd"] = sum(
                    pairs, jnp.zeros((2,), jnp.float32)
                )
        return new_state, metrics

    def build_eval_step(self):
        def eval_step(state: TrainState, batch):
            logits = self.model.apply(
                {"params": state.params},
                batch["input_ids"],
                batch["attention_mask"],
                batch["token_type_ids"],
                train=False,
                rngs={"compress": jax.random.key(0)},
            )
            if self.is_regression:
                preds = logits[:, 0]
            else:
                preds = jnp.argmax(logits, -1)
            loss = bert_loss(logits, batch["labels"], self.is_regression)
            return preds, loss

        return jax.jit(eval_step)

    def fit(self, state: TrainState | None = None) -> TrainState:
        key = jax.random.key(self.cfg.seed)
        if state is None:
            key, k_init = jax.random.split(key)
            state = self.init_state(k_init)
        if self._train_step is None:
            self._train_step = self.build_train_step()
            self._eval_step = self.build_eval_step()
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            state = jax.device_put(state, NamedSharding(self.mesh, P()))

        step = int(state.step)
        for epoch in range(self.cfg.epochs):
            t0 = time.time()
            pending = []  # (step, metrics) not yet synced (Trainer._drain)
            for bi, batch in enumerate(self.data.train_batches(self.cfg.seed + epoch)):
                if (
                    self.cfg.limit_train_batches is not None
                    and bi >= self.cfg.limit_train_batches
                ):
                    break

                device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
                if self.mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    bsh = NamedSharding(self.mesh, P("data"))
                    device_batch = {
                        k: jax.device_put(v, bsh)
                        for k, v in device_batch.items()
                    }
                state, metrics = self._train_step(state, device_batch, key)
                step += 1
                pending.append((step, metrics))
                if step % self.cfg.log_every == 0:
                    if self._drain(pending):
                        return state  # NaN termination
                    pending = []
            if self._drain(pending):
                return state
            val = self.evaluate(state)
            val["epoch"] = epoch
            val["epoch_time_s"] = time.time() - t0
            val.update(self.ratio_acc.summary())
            self.logger.log(step, val)
        return state

    def _drain(self, pending) -> bool:
        """Sync pending step metrics (every step's ratio telemetry is
        accumulated, matching the reference's per-call sum-reduced sizes,
        compress/base.py:8-18); returns True on NaN termination."""
        from smart_quantization_tpu.train.metrics import (
            merge_compression_metrics,
        )

        for s, m in pending:
            host = {k: np.asarray(v) for k, v in m.items()}
            merge_compression_metrics(
                self.ratio_acc,
                {
                    k.split("/", 1)[1]: v
                    for k, v in host.items()
                    if k.startswith("_ratio/")
                },
            )
            loss = float(host["train_loss"])
            self.logger.log(s, {"train_loss": loss})
            if self.cfg.terminate_on_nan and not np.isfinite(loss):
                print(f"NaN loss at step {s}; terminating.", flush=True)
                self.nan_terminated = True
                return True
        return False

    def evaluate(self, state: TrainState) -> dict[str, float]:
        preds, labels, losses = [], [], []
        for bi, batch in enumerate(self.data.val_batches()):
            if (
                self.cfg.limit_val_batches is not None
                and bi >= self.cfg.limit_val_batches
            ):
                break
            device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
            p, loss = self._eval_step(state, device_batch)
            # stay on device; fetch once below (each device->host read is a
            # blocking ~30 ms RPC on the relay backend)
            preds.append(p)
            labels.append(np.asarray(batch["labels"]))
            losses.append(loss)
        if not preds:
            return {}
        preds = np.asarray(jnp.concatenate(preds))
        labels = np.concatenate(labels)
        losses = np.asarray(jnp.stack(losses))
        out = {"val_loss": float(np.mean(losses))}
        out.update(
            {f"val_{k}": v for k, v in glue_metrics(self.task, preds, labels).items()}
        )
        return out


def run_bert(args):
    """CLI path for --model bert (train.py)."""
    from smart_quantization_tpu.data.glue import GLUEData, IMDBData
    from smart_quantization_tpu.train.loop import TrainConfig
    from smart_quantization_tpu.utils.config import build_components

    if args.dataset == "glue":
        data = GLUEData(
            task=args.glue_task,
            batch_size=args.batch_size,
            val_batch_size=args.val_batch_size,
            max_input_length=args.max_input_length,
            tokenizer_name=args.bert_model,
        )
        task = args.glue_task
    else:
        data = IMDBData(
            batch_size=args.batch_size,
            val_batch_size=args.val_batch_size,
            max_input_length=args.max_input_length,
            tokenizer_name=args.bert_model,
        )
        task = "imdb"
    if data.synthetic:
        print("NOTE: HF datasets unavailable offline; using synthetic text data.")
    comps = build_components(args, steps_per_epoch=data.steps_per_epoch)

    cfg = BertConfig.tiny() if getattr(args, "bert_size", "base") == "tiny" else BertConfig()
    model = BertForSequenceClassification(
        cfg,
        num_labels=data.num_labels,
        tap=comps["tap_cfg"],
        freeze_encoder=args.freeze_bert_encoder,
        dtype=(jnp.bfloat16 if getattr(args, "compute_dtype", "float32")
               == "bfloat16" else jnp.float32),
    )
    tcfg = TrainConfig(
        epochs=args.max_epochs,
        log_every=args.log_every,
        terminate_on_nan=args.terminate_on_nan,
        compress_loss=args.compress_loss,
        measure_compression_ratio=args.measure_compression_ratio,
        checkpoint_dir=args.checkpoint_dir,
        limit_train_batches=args.limit_train_batches,
        limit_val_batches=args.limit_val_batches,
        seed=args.seed,
    )
    logger = MetricLogger(args.logdir, args.name)
    mesh = None
    if getattr(args, "dp", None) and args.dp > 1:
        from smart_quantization_tpu.parallel.mesh import make_mesh

        n_dev = jax.device_count()
        if args.dp != n_dev:
            raise SystemExit(
                f"--dp {args.dp} must equal the device count ({n_dev}): the "
                "BERT path uses a pure data-parallel mesh (no fsdp axis)"
            )
        if args.batch_size % args.dp:
            raise SystemExit(
                f"--batch_size {args.batch_size} must be divisible by "
                f"--dp {args.dp} (each device takes batch_size/dp rows)"
            )
        mesh = make_mesh(dp=args.dp)
        print(f"mesh: dp={mesh.shape['data']}; "
              f"grad bits: {args.grad_allreduce_bits or 'fp32'}")
    trainer = BertTrainer(
        model, data, comps["optimizer_spec"],
        optim_comp=comps["optim_comp"],
        loss_compressor=comps["compressor"],
        config=tcfg, logger=logger, task=task,
        mesh=mesh,
        grad_allreduce_bits=getattr(args, "grad_allreduce_bits", 8),
    )
    import jax as _jax

    key = _jax.random.key(tcfg.seed)
    pretrained = (
        load_pretrained_params(args.bert_model, cfg, data.num_labels)
        if args.pretrained and getattr(args, "bert_size", "base") == "base"
        else None
    )
    state = trainer.init_state(key, pretrained)
    state = trainer.fit(state)
    final = trainer.evaluate(state)
    print("final:", final)
    return final
