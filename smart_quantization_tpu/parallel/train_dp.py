"""Data-parallel training step over a jax.sharding.Mesh.

TPU-native replacement for the reference's Lightning DDP
(--accelerator ddp, SURVEY.md row 28): the step runs under shard_map over
the 'data' mesh axis; every device computes gradients on its local batch
shard, gradients are exchanged with the *quantized* all-reduce
(parallel/collectives.py) — int8 payloads over ICI with dequant fused into
the epilogue — and the optimizer step (including weight/grad/momentum
compression) runs replicated.

The stochastic-rounding keys for the optimizer are identical on every device
(so replicated params stay bit-identical); only the augmentation/forward keys
are folded with the device index.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from smart_quantization_tpu.data import cifar as cifar_data
from smart_quantization_tpu.inject.tap import TapConfig
from smart_quantization_tpu.optim.compressed import (
    OptimizerCompression,
    OptimizerSpec,
    compressed_optimizer_step,
    norm_param_mask,
)
from smart_quantization_tpu.parallel.collectives import compressed_allreduce_mean
from smart_quantization_tpu.train.loop import cross_entropy
from smart_quantization_tpu.train.state import TrainState


def make_dp_train_step(
    model,
    spec: OptimizerSpec,
    optim_comp: OptimizerCompression,
    mesh: Mesh,
    *,
    grad_allreduce_bits: int | None = 8,
):
    """Build a jitted DP train step: (state, images_u8, labels, key) ->
    (state, metrics).  ``grad_allreduce_bits=None`` uses plain fp32 pmean
    (the reference-DDP-equivalent baseline)."""

    def local_step(state: TrainState, images_u8, labels, key):
        dev = jax.lax.axis_index("data")
        k_aug, k_fwd = jax.random.split(jax.random.fold_in(key, dev))
        # shared (not device-folded) keys so replicated params stay identical
        k_opt, k_col = jax.random.split(jax.random.fold_in(key, 0x0FF1CE))
        x = cifar_data.augment(images_u8, k_aug)
        x = cifar_data.normalize(x)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            logits, mut = model.apply(
                variables,
                x,
                train=True,
                rngs={"compress": k_fwd},
                mutable=["batch_stats"],
            )
            loss = cross_entropy(logits, labels)
            return loss, (logits, mut)

        (loss, (logits, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )

        if grad_allreduce_bits is None:
            grads = jax.lax.pmean(grads, "data")
        else:
            grads = compressed_allreduce_mean(
                grads, "data", k_col, bits=grad_allreduce_bits
            )
        # BN running stats: average local updates like synced BN-lite
        batch_stats = jax.lax.pmean(mut.get("batch_stats", state.batch_stats), "data")

        exempt = norm_param_mask(state.params)
        params, opt_state, _ = compressed_optimizer_step(
            spec, state.params, grads, state.opt_state, k_opt, optim_comp,
            weight_exempt=exempt,
        )
        new_state = TrainState(state.step + 1, params, batch_stats, opt_state)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        metrics = {
            "train_loss": jax.lax.pmean(loss, "data"),
            "train_accuracy": jax.lax.pmean(acc, "data"),
        }
        return new_state, metrics

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P()),
        out_specs=(P(), P()),
        check_rep=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def shard_batch(mesh: Mesh, images, labels):
    s = NamedSharding(mesh, P("data"))
    return jax.device_put(images, s), jax.device_put(labels, s)


def replicate_state(mesh: Mesh, state: TrainState) -> TrainState:
    return jax.device_put(state, NamedSharding(mesh, P()))
