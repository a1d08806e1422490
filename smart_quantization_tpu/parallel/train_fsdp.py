"""DP+FSDP training via jit sharding annotations (the XLA-managed path).

Complements ``train_dp.py`` (explicit shard_map + quantized-gradient
collectives): here parameters and optimizer state are sharded over the
'fsdp' mesh axis with NamedSharding annotations, the batch over 'data', and
XLA inserts the all-gathers/reduce-scatters (riding ICI) automatically — the
standard JAX FSDP recipe.  Use this path when parameter memory is the
constraint; use the shard_map path when gradient-traffic compression is the
goal.  The two compose: a future round fuses them (quantized reduce-scatter
inside shard_map with fsdp-sharded state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smart_quantization_tpu.data import cifar as cifar_data
from smart_quantization_tpu.optim.compressed import (
    OptimizerCompression,
    OptimizerSpec,
    compressed_optimizer_step,
    norm_param_mask,
)
from smart_quantization_tpu.parallel.mesh import fsdp_sharding, replicated
from smart_quantization_tpu.train.loop import cross_entropy
from smart_quantization_tpu.train.state import TrainState


def state_shardings(mesh: Mesh, state: TrainState) -> TrainState:
    """Sharding tree: params/opt-state fsdp-sharded, the rest replicated."""

    def shard_leaf(leaf):
        return fsdp_sharding(mesh, jax.ShapeDtypeStruct(leaf.shape, leaf.dtype))

    return TrainState(
        step=replicated(mesh),
        params=jax.tree.map(shard_leaf, state.params),
        batch_stats=jax.tree.map(lambda _: replicated(mesh), state.batch_stats),
        opt_state=jax.tree.map(shard_leaf, state.opt_state),
    )


def make_fsdp_train_step(
    model,
    spec: OptimizerSpec,
    optim_comp: OptimizerCompression,
    mesh: Mesh,
):
    """jit-sharded train step: XLA handles parameter gathers/reduces."""

    def step(state: TrainState, images_u8, labels, key):
        k_aug, k_fwd, k_opt = jax.random.split(key, 3)
        x = cifar_data.augment(images_u8, k_aug)
        x = cifar_data.normalize(x)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            logits, mut = model.apply(
                variables, x, train=True,
                rngs={"compress": k_fwd}, mutable=["batch_stats"],
            )
            return cross_entropy(logits, labels), (logits, mut)

        (loss, (logits, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        exempt = norm_param_mask(state.params)
        params, opt_state, _ = compressed_optimizer_step(
            spec, state.params, grads, state.opt_state, k_opt, optim_comp,
            weight_exempt=exempt,
        )
        new_state = TrainState(
            state.step + 1, params, mut.get("batch_stats", state.batch_stats),
            opt_state,
        )
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return new_state, {"train_loss": loss, "train_accuracy": acc}

    def jit_with(state: TrainState):
        ss = state_shardings(mesh, state)
        batch_s = NamedSharding(mesh, P("data"))
        return jax.jit(
            step,
            in_shardings=(ss, batch_s, batch_s, replicated(mesh)),
            out_shardings=(ss, replicated(mesh)),
            donate_argnums=(0,),
        )

    return jit_with


def place_state(mesh: Mesh, state: TrainState) -> TrainState:
    return jax.device_put(state, state_shardings(mesh, state))
