"""The training loop: jitted train/eval steps + epoch driver.

Plays the role of the reference's PyTorch-Lightning Trainer + BaseModule
(/root/reference/smart_compress/models/base.py:42-180, util/train.py:74-219)
as an explicit, functional TPU loop:

- one jitted ``train_step(state, batch, key) -> (state, metrics)`` with
  donated state;
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
from smart_quantization_tpu.data import cifar as cifar_data
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


@dataclasses.dataclass
class TrainConfig:
    epochs: int = 1
    log_every: int = 50
    terminate_on_nan: bool = True
    compress_loss: bool = False
    measure_compression_ratio: bool = False
    checkpoint_dir: str | None = None
    checkpoint_every_epochs: int = 1
    limit_train_batches: int | None = None
    limit_val_batches: int | None = None
    seed: int = 0
    # average per-parameter gradient-norm probe (models/base.py:84-96,165-180)
    measure_average_grad_norm: bool = False
    # jax.profiler trace dir (the reference's --profiler advanced role)
    profile_dir: str | None = None
    profile_steps: int = 10
    # K training steps per host->device dispatch (lax.scan over K batches).
    # The relay backend costs a few RPC round trips per call, which dominates
    # small-model step time; K>1 amortizes it.  Single-chip only.
    steps_per_call: int = 1


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


class Trainer:
    """Image-classification trainer (ResNet/Inception on CIFAR)."""

    def __init__(
        self,
        model,
        data,
        spec: OptimizerSpec,
        *,
        tap_cfg: TapConfig | None = None,
        optim_comp: OptimizerCompression | None = None,
        loss_compressor: CompressorBase | None = None,
        config: TrainConfig = TrainConfig(),
        lr_schedule: Callable[[jax.Array], jax.Array] | None = None,
        logger: MetricLogger | None = None,
        mesh=None,
        grad_allreduce_bits: int | None = 8,
        param_gather_bits: int | None = None,
    ):
        self.model = model
        self.data = data
        self.spec = spec
        self.tap_cfg = tap_cfg
        self.optim_comp = optim_comp or OptimizerCompression(compressor=None)
        self.loss_compressor = loss_compressor
        self.cfg = config
        self.logger = logger or MetricLogger(None)
        self.ratio_acc = RatioAccumulator()
        self._train_step = None
        self._multi_train_step = None
        self._eval_step = None
        self.nan_terminated = False
        self._bwd_tel_active = False
        # data-parallel mesh (reference: Lightning DDP).  When set, the step
        # runs under shard_map with the quantized-gradient all-reduce.
        self.mesh = mesh
        self.grad_allreduce_bits = grad_allreduce_bits
        self.param_gather_bits = param_gather_bits

    # ---------------------------------------------------------------- init
    def init_state(self, key: jax.Array) -> TrainState:
        sample = jnp.zeros((2, 32, 32, 3), jnp.float32)
        k_param, k_comp = jax.random.split(key)
        variables = self.model.init(
            {"params": k_param, "compress": k_comp}, sample, train=True
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if self.optim_comp.use_weight_accumulator or self.optim_comp.packed_momentum:
            from smart_quantization_tpu.optim.compressed import init_opt_state

            opt_state = init_opt_state(self.spec, params, self.optim_comp)
        else:
            opt_state = self.spec.tx.init(params)
        if self.optim_comp.packed_weights:
            from smart_quantization_tpu.optim.compressed import encode_params

            params = encode_params(params, self.optim_comp, k_comp)
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
        shapes = jax.eval_shape(
            lambda rngs, x: self.model.init(rngs, x, train=True),
            {"params": jax.random.key(0), "compress": jax.random.key(1)},
            jnp.zeros((2, 32, 32, 3), jnp.float32),
        )
        tpl = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            shapes.get("telemetry", {}),
        )
        return tpl if jax.tree.leaves(tpl) else None

    def build_train_step(self, state: TrainState | None = None):
        tel_tpl = self._telemetry_template()
        self._bwd_tel_active = tel_tpl is not None
        if self.optim_comp.packed_weights and self._fsdp_active():
            raise NotImplementedError(
                "--packed_weights composes with single-chip and --dp "
                "(replicated codes); under --fsdp the params are already "
                "sharded N-ways and travel as quantized int8 all-gather "
                "payloads"
            )
        if self.optim_comp.packed_momentum and self._fsdp_active():
            # per-shard encode would give shard-local (mean, std) scalars
            # (violating the replicated out-spec) and shard-local min_size
            # decisions (violating the packed structure) — supported on
            # single chip and the DP mesh, where state is replicated
            raise NotImplementedError(
                "--packed_momentum composes with single-chip and --dp; under "
                "--fsdp the optimizer state is already sharded N-ways "
                "(use that for memory scaling)"
            )
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
            return make_fsdp_q_train_step(
                self.model,
                self.spec,
                self.optim_comp,
                self.mesh,
                state,
                grad_bits=self.grad_allreduce_bits,
                param_gather_bits=self.param_gather_bits,
                measure_ratio=self.cfg.measure_compression_ratio,
                tel_tpl=tel_tpl,
            )
        if self.mesh is not None:
            from smart_quantization_tpu.parallel.train_dp import (
                make_dp_train_step,
            )

            return make_dp_train_step(
                self.model,
                self.spec,
                self.optim_comp,
                self.mesh,
                grad_allreduce_bits=self.grad_allreduce_bits,
                measure_ratio=self.cfg.measure_compression_ratio,
                tel_tpl=tel_tpl,
            )

        # single chip: backward (gradient-map) size telemetry via the
        # telemetry-token trick (inject/tap.py): differentiate the loss
        # w.r.t. the zero 'telemetry' collection — its gradient IS
        # [orig_bits, new_bits] per module, with no host callbacks.
        def train_step(state: TrainState, images_u8, labels, key):
            from smart_quantization_tpu.optim.compressed import decode_params

            # per-step randomness derived ON DEVICE from the constant base
            # key + the in-state step counter: the host loop never splits
            # keys (each host-side split is one extra RPC dispatch per step
            # through the relay backend)
            key = jax.random.fold_in(key, state.step)
            k_aug, k_fwd, k_opt, k_loss = jax.random.split(key, 4)
            x = cifar_data.augment(images_u8, k_aug)
            x = cifar_data.normalize(x)
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
                    x,
                    train=True,
                    rngs={"compress": k_fwd},
                    mutable=mutable,
                )
                loss = cross_entropy(logits, labels)
                if self.cfg.compress_loss and self.loss_compressor is not None:
                    # loss compression (models/base.py:114-116, tag "loss")
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
            acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
            metrics = {"train_loss": loss, "train_accuracy": acc}
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
            def multi_step(state: TrainState, images_u8, labels, key):
                def body(st, xs):
                    im, lb = xs
                    return train_step(st, im, lb, key)

                return jax.lax.scan(body, state, (images_u8, labels))

            self._multi_train_step = jax.jit(multi_step, donate_argnums=(0,))
        else:
            self._multi_train_step = None
        return jax.jit(train_step, donate_argnums=(0,))

    def build_eval_step(self):
        def eval_step(state: TrainState, images_u8, labels):
            from smart_quantization_tpu.optim.compressed import decode_params

            x = cifar_data.normalize(images_u8)
            params = decode_params(state.params, self.optim_comp)
            variables = {"params": params, "batch_stats": state.batch_stats}
            logits = self.model.apply(
                variables, x, train=False, rngs={"compress": jax.random.key(0)}
            )
            loss = cross_entropy(logits, labels)
            correct = jnp.sum((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
            return loss, correct

        return jax.jit(eval_step)

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
        if spc > 1 and self.mesh is not None:
            raise ValueError("steps_per_call > 1 is single-chip only")
        for epoch in range(self.cfg.epochs):
            t0 = time.time()
            pending = []  # (last_step, n_substeps, metrics) not yet synced
            group: list = []  # host batches awaiting a K-step dispatch
            for bi, (images, labels) in enumerate(
                self.data.train_batches(self.cfg.seed + epoch)
            ):
                if (
                    self.cfg.limit_train_batches is not None
                    and bi >= self.cfg.limit_train_batches
                ):
                    break
                if spc > 1:
                    group.append((np.asarray(images), np.asarray(labels)))
                    if len(group) < spc:
                        continue
                    imgs = jnp.asarray(np.stack([g[0] for g in group]))
                    lbls = jnp.asarray(np.stack([g[1] for g in group]))
                    group = []
                    # one dispatch runs K scanned steps; metrics come back
                    # with a leading K axis
                    state, metrics = self._multi_train_step(
                        state, imgs, lbls, key
                    )
                    step += spc
                    pending.append((step, spc, metrics))
                else:
                    images, labels = self._place_batch(images, labels)
                    # constant base key: the step derives per-step randomness
                    # from state.step on device (no host-side split per step)
                    state, metrics = self._train_step(
                        state, images, labels, key
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
            # leftover batches smaller than a K-group run singly
            for im, lb in group:
                images, labels = self._place_batch(im, lb)
                state, metrics = self._train_step(state, images, labels, key)
                step += 1
                pending.append((step, 1, metrics))
            if self._drain(pending):
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

    def _place_batch(self, images, labels):
        images = jnp.asarray(images)
        labels = jnp.asarray(labels)
        if self._fsdp_active():
            from smart_quantization_tpu.parallel.train_fsdp_q import shard_batch

            images, labels = shard_batch(self.mesh, images, labels)
        elif self.mesh is not None:
            from smart_quantization_tpu.parallel.train_dp import shard_batch

            images, labels = shard_batch(self.mesh, images, labels)
        return images, labels

    def evaluate(self, state: TrainState) -> dict[str, float]:
        # keep per-batch results on device and fetch ONCE at the end: each
        # device->host scalar read is a blocking ~30 ms RPC on the relay
        # backend, and per-batch float() calls were dominating epoch time
        losses, corrects, count = [], [], 0
        for bi, (images, labels) in enumerate(self.data.val_batches()):
            if (
                self.cfg.limit_val_batches is not None
                and bi >= self.cfg.limit_val_batches
            ):
                break
            images, labels = self._place_batch(images, labels)
            loss, c = self._eval_step(state, images, labels)
            losses.append(loss)
            corrects.append(c)
            count += len(labels)
        if count == 0:
            return {}
        losses = np.asarray(jnp.stack(losses))
        correct = float(np.sum(np.asarray(jnp.stack(corrects))))
        return {
            "val_loss": float(np.mean(losses)),
            "val_accuracy": correct / count,
        }

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
