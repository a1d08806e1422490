"""The training loop: jitted train/eval steps + epoch driver, for EVERY model
family (ResNet/Inception on CIFAR, BERT on GLUE/IMDB — via a Task adapter).

Plays the role of the reference's PyTorch-Lightning Trainer + BaseModule
(/root/reference/smart_compress/models/base.py:42-180, util/train.py:74-219)
as an explicit, functional TPU loop.  Like Lightning's single Trainer serving
every LightningModule (util/train.py:169-195), one Trainer serves every
model here; the model/data-specific pieces live in ``train/task.py``:

- one jitted ``train_step(state, inputs, labels, key) -> (state, metrics)``
  with donated state (``inputs`` is the task's input pytree — an image batch
  or a dict of token arrays);
- optional loss compression (models/base.py:108-117, tag ``loss``);
- the compressed optimizer step (weights/grads/momentum tags);
- NaN termination by default (``terminate_on_nan=True``,
  util/train.py:170) — checked on host at the logging cadence so the hot
  loop never syncs;
- compression-ratio telemetry with the reference's tag taxonomy;
- orbax checkpointing of params + (compressed) optimizer state.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from smart_quantization_tpu.compress.base import CompressorBase
from smart_quantization_tpu.inject.tap import TapConfig
from smart_quantization_tpu.optim.compressed import (
    OptimizerCompression,
    OptimizerSpec,
    compressed_optimizer_step,
    norm_param_mask,
)
from smart_quantization_tpu.train.metrics import (
    MetricLogger,
    RatioAccumulator,
    merge_compression_metrics,
)
from smart_quantization_tpu.train.state import TrainState
from smart_quantization_tpu.train.task import (
    ImageClassificationTask,
    cross_entropy,
)

__all__ = ["TrainConfig", "Trainer", "cross_entropy", "restore_checkpoint"]


@dataclasses.dataclass
class TrainConfig:
    epochs: int = 1
    log_every: int = 50
    terminate_on_nan: bool = True
    compress_loss: bool = False
    measure_compression_ratio: bool = False
    checkpoint_dir: str | None = None
    checkpoint_every_epochs: int = 1
    # int = batch count; 0 < float < 1 = fraction of the epoch (Lightning
    # semantics — the reference's debug config runs limit_train_batches 0.5)
    limit_train_batches: int | float | None = None
    limit_val_batches: int | float | None = None
    # wall-clock budget in seconds (Lightning --max_time role); checked at
    # drain points and epoch boundaries, so the hot loop never syncs for it
    max_time_s: float | None = None
    seed: int = 0
    # average per-parameter gradient-norm probe (models/base.py:84-96,165-180)
    measure_average_grad_norm: bool = False
    # jax.profiler trace dir (the reference's --profiler advanced role)
    profile_dir: str | None = None
    profile_steps: int = 10
    # K training steps per host->device dispatch (lax.scan over K batches).
    # The relay backend costs a few RPC round trips per call, which dominates
    # small-model step time; K>1 amortizes it.  Single-chip only.
    # Tradeoff vs terminate_on_nan: a NaN inside a K-step scan is detected at
    # the next drain, but the remaining K-1 substeps still execute and the
    # returned state includes those post-NaN updates (with K=1 no committed
    # state ever follows the NaN step).
    steps_per_call: int = 1


class Trainer:
    """Model-agnostic trainer; the Task adapter supplies the model family."""

    def __init__(
        self,
        model,
        data,
        spec: OptimizerSpec,
        *,
        task=None,
        tap_cfg: TapConfig | None = None,
        optim_comp: OptimizerCompression | None = None,
        loss_compressor: CompressorBase | None = None,
        config: TrainConfig = TrainConfig(),
        lr_schedule: Callable[[jax.Array], jax.Array] | None = None,
        logger: MetricLogger | None = None,
        mesh=None,
        grad_allreduce_bits: int | None = 8,
        grad_allreduce_mode: str = "auto",
        param_gather_bits: int | None = None,
    ):
        self.model = model
        self.data = data
        self.spec = spec
        self.task = task or ImageClassificationTask()
        self.tap_cfg = tap_cfg
        self.optim_comp = optim_comp or OptimizerCompression(compressor=None)
        self.loss_compressor = loss_compressor
        self.cfg = config
        self.logger = logger or MetricLogger(None)
        self.ratio_acc = RatioAccumulator()
        self._train_step = None
        self._multi_train_step = None
        self._eval_step = None
        self._multi_eval_step = None
        self.nan_terminated = False
        self._bwd_tel_active = False
        # data-parallel mesh (reference: Lightning DDP).  When set, the step
        # runs under shard_map with the quantized-gradient all-reduce.
        self.mesh = mesh
        self.grad_allreduce_bits = grad_allreduce_bits
        self.grad_allreduce_mode = grad_allreduce_mode
        self.param_gather_bits = param_gather_bits

    # ---------------------------------------------------------------- init
    def init_state(self, key: jax.Array, param_overlay=None) -> TrainState:
        """Build the initial TrainState.

        ``param_overlay``: optional dict grafted over the fresh init (used to
        load pretrained BERT encoder weights, reference models/bert.py:31-45).
        """
        sample = self.task.init_sample()
        # three independent roles (ADVICE r2): model-init compression draws,
        # optimizer-state encode, and packed-weight encode
        k_param, k_comp, k_pack = jax.random.split(key, 3)
        variables = self.model.init(
            self.task.init_rngs(k_param, k_comp),
            *self.task.model_args(sample),
            train=True,
        )
        params = variables["params"]
        if param_overlay is not None:
            params = {**params, **param_overlay}
        batch_stats = variables.get("batch_stats", {})
        # under FSDP, packed state is laid out shard-locally (one codebook
        # per shard, stats as (fsdp,) rows — optim/compressed._encode_tree_fsdp)
        fsdp_size = self.mesh.shape["fsdp"] if self._fsdp_active() else None
        if self.optim_comp.use_weight_accumulator or self.optim_comp.packed_momentum:
            from smart_quantization_tpu.optim.compressed import init_opt_state

            opt_state = init_opt_state(
                self.spec, params, self.optim_comp, fsdp_size=fsdp_size
            )
        else:
            opt_state = self.spec.tx.init(params)
        if self.optim_comp.packed_weights:
            from smart_quantization_tpu.optim.compressed import encode_params

            params = encode_params(
                params, self.optim_comp, k_pack, fsdp_size=fsdp_size
            )
        return TrainState(jnp.int32(0), params, batch_stats, opt_state)

    def _fsdp_active(self) -> bool:
        return (
            self.mesh is not None
            and "fsdp" in self.mesh.axis_names
            and self.mesh.shape["fsdp"] > 1
        )

    # ---------------------------------------------------------------- steps
    def _telemetry_template(self):
        """Zero 'telemetry' collection for the backward-size telemetry-token
        trick (inject/tap.py) — None when inactive."""
        if not (
            self.cfg.measure_compression_ratio
            and self.tap_cfg is not None
            and self.tap_cfg.active
            and self.tap_cfg.compress_backward
        ):
            return None
        sample = self.task.init_sample()
        shapes = jax.eval_shape(
            lambda rngs, s: self.model.init(
                rngs, *self.task.model_args(s), train=True
            ),
            self.task.init_rngs(jax.random.key(0), jax.random.key(1)),
            sample,
        )
        tpl = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            shapes.get("telemetry", {}),
        )
        return tpl if jax.tree.leaves(tpl) else None

    def build_train_step(self, state: TrainState | None = None):
        tel_tpl = self._telemetry_template()
        self._bwd_tel_active = tel_tpl is not None
        task = self.task
        if self._fsdp_active():
            # fused FSDP: params/opt-state sharded over 'fsdp', int8
            # quantized param all-gather + gradient reduce-scatter
            from smart_quantization_tpu.parallel.train_fsdp_q import (
                make_fsdp_q_train_step,
            )

            if state is None:
                raise ValueError(
                    "the FSDP path needs the (global-shape) TrainState to "
                    "derive per-leaf shardings; pass it to build_train_step"
                )

            def mk_fsdp(spc):
                return make_fsdp_q_train_step(
                    self.model,
                    self.spec,
                    self.optim_comp,
                    self.mesh,
                    state,
                    task=task,
                    grad_bits=self.grad_allreduce_bits,
                    param_gather_bits=self.param_gather_bits,
                    measure_ratio=self.cfg.measure_compression_ratio,
                    tel_tpl=tel_tpl,
                    loss_compressor=(
                        self.loss_compressor if self.cfg.compress_loss else None
                    ),
                    steps_per_call=spc,
                )

            # K-step dispatch composes with the mesh (scan inside shard_map);
            # the single-step variant handles leftover sub-K groups and only
            # compiles if one occurs (jit is lazy)
            self._multi_train_step = (
                mk_fsdp(self.cfg.steps_per_call)
                if self.cfg.steps_per_call > 1
                else None
            )
            return mk_fsdp(1)
        if self.mesh is not None:
            from smart_quantization_tpu.parallel.train_dp import (
                make_dp_train_step,
            )

            def mk_dp(spc):
                return make_dp_train_step(
                    self.model,
                    self.spec,
                    self.optim_comp,
                    self.mesh,
                    task=task,
                    grad_allreduce_bits=self.grad_allreduce_bits,
                    grad_allreduce_mode=self.grad_allreduce_mode,
                    measure_ratio=self.cfg.measure_compression_ratio,
                    tel_tpl=tel_tpl,
                    loss_compressor=(
                        self.loss_compressor if self.cfg.compress_loss else None
                    ),
                    steps_per_call=spc,
                )

            self._multi_train_step = (
                mk_dp(self.cfg.steps_per_call)
                if self.cfg.steps_per_call > 1
                else None
            )
            return mk_dp(1)

        # single chip: backward (gradient-map) size telemetry via the
        # telemetry-token trick (inject/tap.py): differentiate the loss
        # w.r.t. the zero 'telemetry' collection — its gradient IS
        # [orig_bits, new_bits] per module, with no host callbacks.
        def train_step(state: TrainState, inputs, labels, key):
            from smart_quantization_tpu.optim.compressed import decode_params

            # per-step randomness derived ON DEVICE from the constant base
            # key + the in-state step counter: the host loop never splits
            # keys (each host-side split is one extra RPC dispatch per step
            # through the relay backend)
            key = jax.random.fold_in(key, state.step)
            k_data, k_fwd, k_opt, k_loss = jax.random.split(key, 4)
            x = task.prepare_train(inputs, k_data)
            # packed weights: uint8 codes -> fp32 view (identity otherwise)
            in_params = decode_params(state.params, self.optim_comp)

            def loss_fn(params, telemetry):
                variables = {"params": params, "batch_stats": state.batch_stats}
                if telemetry is not None:
                    variables["telemetry"] = telemetry
                mutable = ["batch_stats"]
                if self.cfg.measure_compression_ratio:
                    mutable.append("compression_stats")
                logits, mut = self.model.apply(
                    variables,
                    *task.model_args(x),
                    train=True,
                    rngs=task.train_rngs(k_fwd, k_data),
                    mutable=mutable,
                )
                loss = task.loss(logits, labels)
                if self.cfg.compress_loss and self.loss_compressor is not None:
                    # loss compression (models/base.py:114-116, tag "loss")
                    with jax.named_scope("compress/loss"):
                        loss_q, _ = self.loss_compressor(loss[None], k_loss)
                    loss = loss_q[0]
                return loss, (logits, mut)

            if tel_tpl is not None:
                (loss, (logits, mut)), (grads, tel_grads) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True
                )(in_params, tel_tpl)
            else:
                (loss, (logits, mut)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(in_params, None)
                tel_grads = None

            exempt = norm_param_mask(in_params)
            params, opt_state, opt_metrics = compressed_optimizer_step(
                self.spec,
                in_params,
                grads,
                state.opt_state,
                k_opt,
                self.optim_comp,
                weight_exempt=exempt,
            )
            new_state = TrainState(
                state.step + 1,
                params,
                mut.get("batch_stats", state.batch_stats),
                opt_state,
            )
            metrics = {"train_loss": loss}
            metrics.update(task.train_metrics(logits, labels))
            if self.cfg.measure_average_grad_norm:
                norms = jnp.stack(
                    [jnp.linalg.norm(g) for g in jax.tree.leaves(grads)]
                )
                metrics["avg_grad_norm"] = jnp.mean(norms)
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

        if self.cfg.steps_per_call > 1:
            # K steps per dispatch: the relay backend costs a few RPC round
            # trips per host->device call, which dominates small-model step
            # time; lax.scan over K pre-uploaded batches amortizes it.
            # Composes with the on-device key derivation (each scanned step
            # folds its own state.step).
            def multi_step(state: TrainState, inputs, labels, key):
                def body(st, xs):
                    ins, lb = xs
                    return train_step(st, ins, lb, key)

                return jax.lax.scan(body, state, (inputs, labels))

            self._multi_train_step = jax.jit(multi_step, donate_argnums=(0,))
        else:
            self._multi_train_step = None
        return jax.jit(train_step, donate_argnums=(0,))

    def build_eval_step(self):
        task = self.task

        def eval_step(state: TrainState, inputs, labels):
            from smart_quantization_tpu.optim.compressed import decode_params

            x = task.prepare_eval(inputs)
            params = decode_params(state.params, self.optim_comp)
            variables = {"params": params, "batch_stats": state.batch_stats}
            logits = self.model.apply(
                variables,
                *task.model_args(x),
                train=False,
                rngs=task.eval_rngs(),
            )
            return task.eval_outputs(logits, labels)

        if self.cfg.steps_per_call > 1:
            # batch K val dispatches into one lax.scan call — per-call RPC
            # latency (~30 ms on relayed backends) otherwise dominates eval.
            # Works under meshes too: eval inputs stay replicated (exactly
            # like the existing small-val-batch path) and GSPMD handles the
            # sharded state, so grouping only changes dispatch count.
            def multi_eval(state: TrainState, inputs, labels):
                def body(_, xs):
                    ins, lb = xs
                    return None, eval_step(state, ins, lb)

                return jax.lax.scan(body, None, (inputs, labels))[1]

            self._multi_eval_step = jax.jit(multi_eval)
        else:
            self._multi_eval_step = None
        return jax.jit(eval_step)

    @staticmethod
    def _resolve_limit(v, total):
        """Lightning limit semantics: None, an int batch count, or a float
        fraction 0 < f <= 1.0 of ``total`` batches.

        The CLI parses the flag as float, so a Lightning-style ``1.0`` means
        the WHOLE epoch (only the int ``1`` means one batch)."""
        if v is None:
            return None
        if isinstance(v, float) and 0 < v <= 1.0:
            if v == 1.0:
                return None  # 100% of the epoch == no limit
            return max(1, int(v * total)) if total else None
        if isinstance(v, float) and v != int(v):
            # Lightning rejects fractional limits outside [0, 1]; a typo'd
            # --limit_val_batches 1.5 must not silently become 1 batch
            # (ADVICE r4).  Whole floats (5.0) are accepted as counts to
            # match the CLI's float parse.
            raise ValueError(
                f"fractional batch limit {v} is outside (0, 1]; pass a "
                "fraction in (0, 1] or an integral batch count"
            )
        return int(v)

    # ---------------------------------------------------------------- loop
    def fit(self, state: TrainState | None = None) -> TrainState:
        key = jax.random.key(self.cfg.seed)
        if state is None:
            key, k_init = jax.random.split(key)
            state = self.init_state(k_init)
        if self._train_step is None:
            # build BEFORE placing: the FSDP path derives shardings from the
            # global-shape state
            self._train_step = self.build_train_step(state)
            self._eval_step = self.build_eval_step()
        if self._fsdp_active():
            from smart_quantization_tpu.parallel.train_fsdp_q import place_state

            state = place_state(self.mesh, state)
        elif self.mesh is not None:
            from smart_quantization_tpu.parallel.train_dp import replicate_state

            state = replicate_state(self.mesh, state)
        if self.cfg.measure_compression_ratio and not getattr(
            self, "_bwd_tel_active", False
        ):
            # fallback only: when the telemetry-token path is inactive,
            # backward sizes escape the vjp via the host sink (inject/tap.py)
            from smart_quantization_tpu.inject.tap import set_backward_stats_sink

            set_backward_stats_sink(self.ratio_acc.add)

        step = int(state.step)
        profiling = False
        profile_end = step + self.cfg.profile_steps
        if self.cfg.profile_dir:
            jax.profiler.start_trace(self.cfg.profile_dir)
            profiling = True
        spc = self.cfg.steps_per_call
        fit_t0 = time.time()

        def time_up() -> bool:
            return (
                self.cfg.max_time_s is not None
                and time.time() - fit_t0 >= self.cfg.max_time_s
            )

        lim_train = self._resolve_limit(
            self.cfg.limit_train_batches,
            getattr(self.data, "steps_per_epoch", 0),
        )
        for epoch in range(self.cfg.epochs):
            t0 = time.time()
            pending = []  # (last_step, n_substeps, metrics) not yet synced
            group: list = []  # host batches awaiting a K-step dispatch
            for bi, batch in enumerate(
                self.data.train_batches(self.cfg.seed + epoch)
            ):
                if lim_train is not None and bi >= lim_train:
                    break
                inputs, labels = self.task.split_batch(batch)
                if spc > 1:
                    group.append(
                        (
                            jax.tree.map(np.asarray, inputs),
                            np.asarray(labels),
                        )
                    )
                    if len(group) < spc:
                        continue
                    ins = jax.tree.map(
                        lambda *xs: jnp.asarray(np.stack(xs)),
                        *[g[0] for g in group],
                    )
                    lbls = jnp.asarray(np.stack([g[1] for g in group]))
                    group = []
                    if self._fsdp_active():
                        from smart_quantization_tpu.parallel.train_fsdp_q import (
                            shard_batch_multi,
                        )

                        ins, lbls = shard_batch_multi(self.mesh, ins, lbls)
                    elif self.mesh is not None:
                        from smart_quantization_tpu.parallel.train_dp import (
                            shard_batch_multi,
                        )

                        ins, lbls = shard_batch_multi(self.mesh, ins, lbls)
                    # one dispatch runs K scanned steps; metrics come back
                    # with a leading K axis
                    state, metrics = self._multi_train_step(
                        state, ins, lbls, key
                    )
                    step += spc
                    pending.append((step, spc, metrics))
                else:
                    inputs, labels = self._place_batch(inputs, labels)
                    # constant base key: the step derives per-step randomness
                    # from state.step on device (no host-side split per step)
                    state, metrics = self._train_step(
                        state, inputs, labels, key
                    )
                    step += 1
                    pending.append((step, 1, metrics))
                if profiling and step >= profile_end:
                    jax.block_until_ready(metrics)
                    jax.profiler.stop_trace()
                    profiling = False
                if step % self.cfg.log_every < (spc if spc > 1 else 1):
                    if self._drain(pending):
                        return state  # NaN termination
                    pending = []
                    if time_up():
                        print(f"max_time reached at step {step}; stopping.",
                              flush=True)
                        return state
            # leftover batches smaller than a K-group run singly
            for ins, lb in group:
                inputs, labels = self._place_batch(ins, lb)
                state, metrics = self._train_step(state, inputs, labels, key)
                step += 1
                pending.append((step, 1, metrics))
            if self._drain(pending):
                return state
            if time_up():
                print(f"max_time reached at step {step}; stopping.",
                      flush=True)
                return state

            if profiling:
                jax.profiler.stop_trace()
                profiling = False
            val = self.evaluate(state)
            val["epoch"] = epoch
            val["epoch_time_s"] = time.time() - t0
            val.update(self.ratio_acc.summary())
            self.logger.log(step, val)
            self._maybe_checkpoint(state, epoch)
        return state

    def _drain(self, pending) -> bool:
        """Sync pending metrics; returns True if training must stop (NaN).

        Entries are ``(last_step, n_substeps, metrics)``; K-step dispatches
        deliver metrics with a leading K axis, sliced on host here."""
        expanded = []
        for last, n, m in pending:
            host = {k: np.asarray(v) for k, v in m.items()}
            if n == 1:
                expanded.append((last, host))
            else:
                for i in range(n):
                    expanded.append(
                        (last - n + 1 + i, {k: v[i] for k, v in host.items()})
                    )
        for s, host in expanded:
            scalars = {
                k: float(v) for k, v in host.items() if not k.startswith("_ratio/")
            }
            ratios = {
                k.split("/", 1)[1]: v
                for k, v in host.items()
                if k.startswith("_ratio/")
            }
            merge_compression_metrics(self.ratio_acc, ratios)
            self.logger.log(s, scalars, echo=(s % (self.cfg.log_every * 4) == 0))
            if self.cfg.terminate_on_nan and not np.isfinite(
                scalars.get("train_loss", 0.0)
            ):
                # the reference's terminate_on_nan=True (util/train.py:170)
                print(f"NaN/inf loss at step {s}; terminating.", flush=True)
                self.nan_terminated = True
                return True
        return False

    def _place_batch(self, inputs, labels):
        inputs = jax.tree.map(jnp.asarray, inputs)
        labels = jnp.asarray(labels)
        if self._fsdp_active():
            from smart_quantization_tpu.parallel.train_fsdp_q import shard_batch

            inputs, labels = shard_batch(self.mesh, inputs, labels)
        elif self.mesh is not None:
            from smart_quantization_tpu.parallel.train_dp import shard_batch

            inputs, labels = shard_batch(self.mesh, inputs, labels)
        return inputs, labels

    def evaluate(self, state: TrainState) -> dict[str, float]:
        # keep per-batch results on device and fetch ONCE at the end: each
        # device->host scalar read is a blocking ~30 ms RPC on the relay
        # backend, and per-batch float() calls were dominating epoch time
        outs, labels_host, count = [], [], 0
        group: list = []  # host batches awaiting a K-scan eval dispatch
        spc = self.cfg.steps_per_call if self._multi_eval_step is not None else 1
        lim_val = self._resolve_limit(
            self.cfg.limit_val_batches,
            getattr(self.data, "val_steps_per_epoch", 0),
        )
        for bi, batch in enumerate(self.data.val_batches()):
            if lim_val is not None and bi >= lim_val:
                break
            inputs, labels = self.task.split_batch(batch)
            if spc > 1:
                group.append(
                    (jax.tree.map(np.asarray, inputs), np.asarray(labels))
                )
                labels_host.append(group[-1][1])
                count += len(group[-1][1])
                if len(group) < spc:
                    continue
                ins = jax.tree.map(
                    lambda *xs: jnp.asarray(np.stack(xs)),
                    *[g[0] for g in group],
                )
                lbls = jnp.asarray(np.stack([g[1] for g in group]))
                group = []
                # one dispatch evaluates K batches; outs get a leading K axis
                outs.append(self._multi_eval_step(state, ins, lbls))
                continue
            # shard the eval batch only when it divides the mesh; small val
            # batches (default bs//4, cifar_base.py:36-37) run replicated
            n_dev = (
                1
                if self.mesh is None
                else int(np.prod(list(self.mesh.shape.values())))
            )
            if len(np.asarray(labels)) % n_dev == 0:
                inputs, labels = self._place_batch(inputs, labels)
            else:
                inputs = jax.tree.map(jnp.asarray, inputs)
                labels = jnp.asarray(labels)
            outs.append(self._eval_step(state, inputs, labels))
            labels_host.append(np.asarray(labels))
            count += len(labels_host[-1])
        for ins, lb in group:  # leftover batches smaller than a K-group
            outs.append(
                jax.tree.map(
                    lambda x: x[None],
                    self._eval_step(state, jax.tree.map(jnp.asarray, ins),
                                    jnp.asarray(lb)),
                )
            )
        if count == 0:
            return {}
        if spc > 1:
            # concatenate groups along the K axis -> (total_batches, ...)
            stacked = jax.tree.map(
                lambda *xs: jnp.concatenate(xs, axis=0), *outs
            )
        else:
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *outs)
        host = jax.tree.map(np.asarray, stacked)
        return self.task.eval_summary(
            host, np.concatenate(labels_host), count
        )

    def _maybe_checkpoint(self, state: TrainState, epoch: int) -> None:
        if not self.cfg.checkpoint_dir:
            return
        if (epoch + 1) % self.cfg.checkpoint_every_epochs:
            return
        import orbax.checkpoint as ocp

        path = os.path.abspath(
            os.path.join(self.cfg.checkpoint_dir, f"epoch_{epoch:04d}")
        )
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(state), force=True)
        ckptr.wait_until_finished()


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
