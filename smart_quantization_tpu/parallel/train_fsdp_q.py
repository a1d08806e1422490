"""Fused FSDP + quantized-collectives training (the shard_map FSDP path).

Combines the two existing parallel paths (PARITY.md row 28's tracked gap):
``train_dp.py`` quantizes gradient traffic but replicates parameters;
``train_fsdp.py`` shards parameters/optimizer state but lets XLA move fp32.
Here BOTH are explicit inside one shard_map over a ('data','fsdp') mesh:

- parameters + optimizer state live sharded over 'fsdp'
  (``mesh.fsdp_shard_axis`` picks the axis per leaf; indivisible leaves are
  replicated);
- the forward all-gathers parameter shards over 'fsdp' — optionally on int8
  payloads (``param_gather_bits``), 4x less gather traffic;
- the batch is sharded over ALL devices (data*fsdp act as the DP axis);
- gradients are exchanged with an int8 shared-scale payload: ``psum`` over
  'data' then ``psum_scatter`` over 'fsdp' (collectives.py), dequantized
  once on the local shard — the reference's fp32 NCCL all-reduce
  (SURVEY.md row 28 / section 3.4) upgraded to a quantized reduce-scatter
  riding ICI;
- the compressed optimizer step (optim/compressed.py) runs on the local
  shard only: FSDP memory scaling for params, momentum AND master weights.

Stochastic-rounding key discipline: forward/augment keys are folded with the
global device index (independent data); gradient-payload keys likewise (the
quantized values differ per device); the optimizer and parameter-gather keys
are shared across the 'data' axis so replicated state stays bit-identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smart_quantization_tpu.optim.compressed import (
    OptimizerCompression,
    OptimizerSpec,
    compressed_optimizer_step,
    decode_params,
    norm_param_mask,
)
from smart_quantization_tpu.parallel.collectives import (
    compressed_all_gather_flat,
    compressed_psum_mean_flat,
    compressed_reduce_scatter_rows,
)
from smart_quantization_tpu.parallel.mesh import fsdp_shard_axis, fsdp_spec
from smart_quantization_tpu.train.state import TrainState
from smart_quantization_tpu.train.task import ImageClassificationTask


def _shard_axes(tree, fsdp_size: int):
    """Pytree of per-leaf shard-axis ints (-1 = replicated)."""
    return jax.tree.map(lambda l: fsdp_shard_axis(l.shape, fsdp_size), tree)


def _spec_tree(tree, fsdp_size: int):
    return jax.tree.map(lambda l: fsdp_spec(l.shape, fsdp_size), tree)


def state_spec_tree(mesh: Mesh, state: TrainState) -> TrainState:
    """PartitionSpec tree for a TrainState on the dp x fsdp mesh.

    Sharded axes refer to the LOCAL (already-sharded) shapes when called on
    a placed state and to global shapes when called on an unplaced one — the
    divisibility rule gives the same axis either way because shard sizes stay
    divisible by fsdp_size only if the global size was.  Always call this on
    the UNPLACED (global) state.
    """
    fsdp = mesh.shape["fsdp"]
    return TrainState(
        step=P(),
        params=_spec_tree(state.params, fsdp),
        batch_stats=jax.tree.map(lambda _: P(), state.batch_stats),
        opt_state=_spec_tree(state.opt_state, fsdp),
    )


def place_state(mesh: Mesh, state: TrainState) -> TrainState:
    fsdp = mesh.shape["fsdp"]

    def shard(x):
        return jax.device_put(x, NamedSharding(mesh, fsdp_spec(x.shape, fsdp)))

    def repl(x):
        return jax.device_put(x, NamedSharding(mesh, P()))

    return TrainState(
        step=repl(state.step),
        params=jax.tree.map(shard, state.params),
        batch_stats=jax.tree.map(repl, state.batch_stats),
        opt_state=jax.tree.map(shard, state.opt_state),
    )


def make_fsdp_q_train_step(
    model,
    spec: OptimizerSpec,
    optim_comp: OptimizerCompression,
    mesh: Mesh,
    state: TrainState,
    *,
    task=None,
    grad_bits: int | None = 8,
    param_gather_bits: int | None = None,
    measure_ratio: bool = False,
    tel_tpl=None,
    loss_compressor=None,
    steps_per_call: int = 1,
):
    """Build the jitted fused step for ``state``'s pytree structure.

    ``steps_per_call`` > 1 scans K steps inside one shard_map dispatch
    (leading K axis on inputs/labels, batch axis sharded over the whole
    mesh) — see ``train_dp.make_dp_train_step``.

    ``state`` is only inspected for shapes (pass the unplaced, global-shape
    state).  ``grad_bits=None`` falls back to fp32 psum + reduce-scatter;
    ``param_gather_bits=None`` gathers parameters in their stored dtype.
    ``measure_ratio`` / ``tel_tpl``: compression-size telemetry, as in
    ``train_dp.make_dp_train_step`` (forward sown stats + backward
    telemetry-token gradients, psum'd over the whole mesh).  ``task`` makes
    the step model-agnostic (train/task.py); ``loss_compressor`` compresses
    the loss scalar with a device-shared key.
    """
    task = task or ImageClassificationTask()
    if not measure_ratio:
        # telemetry grads are only consumed when ratios are measured; don't
        # differentiate w.r.t. the token collection for nothing
        tel_tpl = None
    fsdp_size = mesh.shape["fsdp"]
    data_size = mesh.shape["data"]
    n_total = fsdp_size * data_size
    # packed (uint8 codebook) params decode to plain fp32 leaves; gather /
    # grad-exchange axes come from the DECODED template (identity otherwise)
    dec_tpl = jax.eval_shape(
        lambda pr: decode_params(pr, optim_comp), state.params
    )
    param_axes = _shard_axes(dec_tpl, fsdp_size)
    state_specs = state_spec_tree(mesh, state)

    # Bucketed exchanges: every sharded leaf is packed into ONE flat buffer
    # so a single collective moves the whole parameter set / gradient —
    # large fused collectives ride ICI at full bandwidth and keep the XLA
    # program small (vs ~2 collectives per leaf).

    def gather_params(params, key):
        leaves, treedef = jax.tree.flatten(params)
        axes = jax.tree.leaves(param_axes)
        out = list(leaves)
        sharded = [
            (i, l, a) for i, (l, a) in enumerate(zip(leaves, axes)) if a >= 0
        ]
        if sharded:
            flat = jnp.concatenate([l.reshape(-1) for _, l, _ in sharded])
            if param_gather_bits is None:
                rows = jax.lax.all_gather(flat, "fsdp")  # (n, L)
            else:
                # fold with the fsdp index (each shard is distinct data), NOT
                # the data index (replicas must produce identical payloads)
                k = jax.random.fold_in(key, jax.lax.axis_index("fsdp"))
                rows = compressed_all_gather_flat(
                    flat, "fsdp", k, bits=param_gather_bits
                )
            off = 0
            for i, l, a in sharded:
                piece = rows[:, off : off + l.size]
                piece = piece.reshape((fsdp_size,) + l.shape).astype(l.dtype)
                full = jnp.moveaxis(piece, 0, a)
                shape = list(l.shape)
                shape[a] *= fsdp_size
                out[i] = full.reshape(shape)
                off += l.size
        return jax.tree.unflatten(treedef, out)

    def exchange_grads(grads, key):
        leaves, treedef = jax.tree.flatten(grads)
        axes = jax.tree.leaves(param_axes)
        out = list(leaves)
        gidx = jax.lax.axis_index("data") * fsdp_size + jax.lax.axis_index("fsdp")
        if grad_bits is None:
            k_sh = k_rep = None
        else:
            k_sh, k_rep = jax.random.split(jax.random.fold_in(key, gidx))
        sharded = [
            (i, l, a) for i, (l, a) in enumerate(zip(leaves, axes)) if a >= 0
        ]
        repl = [
            (i, l) for i, (l, a) in enumerate(zip(leaves, axes)) if a < 0
        ]
        if sharded:
            rows = []
            for _, l, a in sharded:
                # split dim a into (fsdp, local) blocks, blocks to the front
                pre, la, post = l.shape[:a], l.shape[a] // fsdp_size, l.shape[a + 1 :]
                blocks = l.reshape(pre + (fsdp_size, la) + post)
                blocks = jnp.moveaxis(blocks, len(pre), 0)
                rows.append(blocks.reshape(fsdp_size, -1))
            buf = jnp.concatenate(rows, axis=1)  # (fsdp, total_local)
            if grad_bits is None:
                s = jax.lax.psum(buf, "data")
                mine = (
                    jax.lax.psum_scatter(
                        s, "fsdp", scatter_dimension=0, tiled=True
                    ).reshape(-1)
                    / n_total
                )
            else:
                mine = compressed_reduce_scatter_rows(
                    buf, "fsdp", k_sh, bits=grad_bits, sum_axis_name="data"
                )
            off = 0
            for i, l, a in sharded:
                pre, la, post = l.shape[:a], l.shape[a] // fsdp_size, l.shape[a + 1 :]
                sz = l.size // fsdp_size
                out[i] = (
                    mine[off : off + sz].reshape(pre + (la,) + post).astype(l.dtype)
                )
                off += sz
        if repl:
            flat = jnp.concatenate([l.reshape(-1) for _, l in repl])
            if grad_bits is None:
                red = jax.lax.pmean(flat, ("data", "fsdp"))
            else:
                red = compressed_psum_mean_flat(
                    flat, ("data", "fsdp"), k_rep, bits=grad_bits
                )
            off = 0
            for i, l in repl:
                out[i] = red[off : off + l.size].reshape(l.shape).astype(l.dtype)
                off += l.size
        return jax.tree.unflatten(treedef, out)

    def local_step(state: TrainState, inputs, labels, key):
        # per-step randomness from the constant base key + on-device step
        # counter (no host-side key split per step)
        key = jax.random.fold_in(key, state.step)
        gidx = jax.lax.axis_index("data") * fsdp_size + jax.lax.axis_index("fsdp")
        k_data, k_fwd = jax.random.split(jax.random.fold_in(key, gidx))
        # shared across devices: optimizer + gather keys (replicas identical)
        k_opt, k_col, k_gather, k_loss = jax.random.split(
            jax.random.fold_in(key, 0x0FF1CE), 4
        )
        x = task.prepare_train(inputs, k_data)

        # packed weights: local uint8 shard codes -> fp32 view (identity
        # otherwise); shard-local stats, so the decode needs no collective
        in_params = decode_params(state.params, optim_comp)
        full_params = gather_params(in_params, k_gather)

        def loss_fn(params, telemetry):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if telemetry is not None:
                variables["telemetry"] = telemetry
            mutable = ["batch_stats"]
            if measure_ratio:
                mutable.append("compression_stats")
            logits, mut = model.apply(
                variables, *task.model_args(x), train=True,
                rngs=task.train_rngs(k_fwd, k_data), mutable=mutable,
            )
            loss = task.loss(logits, labels)
            if loss_compressor is not None:
                with jax.named_scope("compress/loss"):
                    loss_q, _ = loss_compressor(loss[None], k_loss)
                loss = loss_q[0]
            return loss, (logits, mut)

        if tel_tpl is not None:
            (loss, (logits, mut)), (grads, tel_grads) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(full_params, tel_tpl)
        else:
            (loss, (logits, mut)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(full_params, None)
            tel_grads = None

        grad_shards = exchange_grads(grads, k_col)
        batch_stats = jax.lax.pmean(
            mut.get("batch_stats", state.batch_stats), ("data", "fsdp")
        )

        exempt = norm_param_mask(in_params)
        params, opt_state, opt_metrics = compressed_optimizer_step(
            spec, in_params, grad_shards, state.opt_state, k_opt,
            optim_comp, weight_exempt=exempt,
            # packed stats live as (1,) rows per shard -> (fsdp,) globally
            packed_stats_rank1=True,
        )
        new_state = TrainState(state.step + 1, params, batch_stats, opt_state)
        metrics = {"train_loss": jax.lax.pmean(loss, ("data", "fsdp"))}
        for k, v in task.train_metrics(logits, labels).items():
            metrics[k] = jax.lax.pmean(v, ("data", "fsdp"))
        if measure_ratio:
            from smart_quantization_tpu.train.metrics import fold_sown_stats

            for tag, tot in fold_sown_stats(
                mut.get("compression_stats", {})
            ).items():
                metrics[f"_ratio/{tag}"] = jax.lax.psum(tot, ("data", "fsdp"))
            # optimizer state is sharded over 'fsdp' (each shard quantized
            # once) and replicated over 'data': psum over 'fsdp' only
            for tag, pair in opt_metrics.items():
                metrics[f"_ratio/{tag}"] = jax.lax.psum(pair, "fsdp")
            if tel_grads is not None:
                pairs = jax.tree.leaves(tel_grads)
                metrics["_ratio/backward_autograd"] = jax.lax.psum(
                    sum(pairs, jnp.zeros((2,), jnp.float32)), ("data", "fsdp")
                )
        return new_state, metrics

    if steps_per_call > 1:

        def local_multi(state: TrainState, inputs, labels, key):
            def body(st, xs):
                ins, lb = xs
                return local_step(st, ins, lb, key)

            return jax.lax.scan(body, state, (inputs, labels))

        fn, batch_spec = local_multi, P(None, ("data", "fsdp"))
    else:
        fn, batch_spec = local_step, P(("data", "fsdp"))
    sharded = shard_map(
        fn,
        mesh=mesh,
        in_specs=(state_specs, batch_spec, batch_spec, P()),
        out_specs=(state_specs, P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def shard_batch(mesh: Mesh, inputs, labels):
    s = NamedSharding(mesh, P(("data", "fsdp")))
    return (
        jax.tree.map(lambda x: jax.device_put(x, s), inputs),
        jax.device_put(labels, s),
    )


def shard_batch_multi(mesh: Mesh, inputs, labels):
    """Place a K-step stacked batch: axis 0 = step, axis 1 = batch rows
    (sharded over the whole data*fsdp mesh)."""
    s = NamedSharding(mesh, P(None, ("data", "fsdp")))
    return (
        jax.tree.map(lambda x: jax.device_put(x, s), inputs),
        jax.device_put(labels, s),
    )
