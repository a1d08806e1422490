#!/usr/bin/env python
"""Localize the SmaQ/BERT NaN: per-step global diagnostics + per-leaf
first-nonfinite report.

Runs the exact bert_sweep training configuration (full-coverage smart 6/8,
AdamW) with an instrumented single-chip step that also returns:
  max|param|, max|grad|, max|mu|, max nu, min nu, max|logit|, loss
fetched to host EVERY step (slow, diagnostic only).  On the first non-finite
loss it prints which state leaves contain non-finite values.

  python experiments/bert_nan_probe.py --learning_rate 2e-4 --epochs 40
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--learning_rate", type=float, default=2e-4)
    ap.add_argument("--weight_decay", type=float, default=0.01)
    ap.add_argument("--epsilon", type=float, default=1e-8)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--max_input_length", type=int, default=32)
    ap.add_argument("--train_n", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log_every", type=int, default=8)
    args = ap.parse_args()

    from smart_quantization_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from smart_quantization_tpu.compress import build_compressor
    from smart_quantization_tpu.data.glue import GLUEData
    from smart_quantization_tpu.inject.tap import TapConfig
    from smart_quantization_tpu.models.bert import (
        BertConfig,
        BertForSequenceClassification,
    )
    from smart_quantization_tpu.optim.compressed import (
        OptimizerCompression,
        build_optimizer,
        compressed_optimizer_step,
        norm_param_mask,
    )
    from smart_quantization_tpu.train.task import SequenceClassificationTask

    comp = build_compressor("smart")
    tap = TapConfig(compressor=comp)
    optim_comp = OptimizerCompression(compressor=comp)
    data = GLUEData(
        task="stsb", batch_size=args.batch_size,
        max_input_length=args.max_input_length,
        synthetic_train=args.train_n, synthetic_val=256,
    )
    model = BertForSequenceClassification(
        BertConfig.tiny(), num_labels=data.num_labels, tap=tap
    )
    spec = build_optimizer(
        "adamw", args.learning_rate,
        weight_decay=args.weight_decay, epsilon=args.epsilon,
    )
    task = SequenceClassificationTask(
        task_name="stsb", is_regression=True,
        max_input_length=args.max_input_length,
    )

    key = jax.random.key(args.seed)
    sample = task.init_sample()
    variables = model.init(
        task.init_rngs(key, jax.random.fold_in(key, 1)),
        *task.model_args(sample), train=True,
    )
    params = variables["params"]
    opt_state = spec.tx.init(params)

    def tree_max_abs(t):
        leaves = [jnp.max(jnp.abs(l)) for l in jax.tree.leaves(t)]
        return jnp.max(jnp.stack(leaves)) if leaves else jnp.float32(0)

    def adam_states(opt_state):
        return [
            s for s in jax.tree.leaves(
                opt_state,
                is_leaf=lambda s: isinstance(s, optax.ScaleByAdamState),
            )
            if isinstance(s, optax.ScaleByAdamState)
        ]

    @jax.jit
    def step(params, opt_state, inputs, labels, key):
        k_fwd, k_opt, k_data = jax.random.split(key, 3)

        def loss_fn(p):
            logits = model.apply(
                {"params": p}, *task.model_args(inputs), train=True,
                rngs=task.train_rngs(k_fwd, k_data),
            )
            return task.loss(logits, labels), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        exempt = norm_param_mask(params)
        new_params, new_opt, _ = compressed_optimizer_step(
            spec, params, grads, opt_state, k_opt, optim_comp,
            weight_exempt=exempt,
        )
        st = adam_states(new_opt)[0]
        diags = {
            "loss": loss,
            "max_logit": jnp.max(jnp.abs(logits)),
            "max_param": tree_max_abs(new_params),
            "max_grad": tree_max_abs(grads),
            "max_mu": tree_max_abs(st.mu),
            "max_nu": tree_max_abs(st.nu),
            "min_nu": jnp.min(
                jnp.stack([jnp.min(l) for l in jax.tree.leaves(st.nu)])
            ),
        }
        return new_params, new_opt, diags, grads

    def leaf_report(tag, tree):
        bad = []
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            a = np.asarray(leaf)
            if not np.all(np.isfinite(a)):
                bad.append(
                    f"  {tag}{jax.tree_util.keystr(path)}: "
                    f"{(~np.isfinite(a)).sum()}/{a.size} nonfinite "
                    f"max|finite|={np.abs(a[np.isfinite(a)]).max() if np.isfinite(a).any() else 0:.3e}"
                )
        return bad

    step_i = 0
    prev = None
    for epoch in range(args.epochs):
        for batch in data.train_batches(args.seed + epoch):
            inputs, labels = task.split_batch(batch)
            inputs = jax.tree.map(jnp.asarray, inputs)
            labels = jnp.asarray(labels)
            k = jax.random.fold_in(key, 1000 + step_i)
            params, opt_state, diags, grads = step(
                params, opt_state, inputs, labels, k
            )
            host = {k2: float(v) for k2, v in diags.items()}
            if step_i % args.log_every == 0 or not np.isfinite(host["loss"]):
                print(
                    f"step {step_i:5d} loss={host['loss']:.4f} "
                    f"|logit|={host['max_logit']:.3e} "
                    f"|param|={host['max_param']:.3e} "
                    f"|grad|={host['max_grad']:.3e} "
                    f"|mu|={host['max_mu']:.3e} nu=[{host['min_nu']:.3e},"
                    f"{host['max_nu']:.3e}]",
                    flush=True,
                )
            if not np.isfinite(host["loss"]) or host["max_param"] > 1e6:
                print(f"\nFIRST NON-FINITE/EXPLODED at step {step_i}")
                for tag, tree in (
                    ("params", params), ("grads", grads),
                    ("mu", adam_states(opt_state)[0].mu),
                    ("nu", adam_states(opt_state)[0].nu),
                ):
                    for line in leaf_report(tag, tree):
                        print(line, flush=True)
                if prev is not None:
                    print("previous-step diags:", prev)
                return
            prev = host
            step_i += 1
        print(f"epoch {epoch} done", flush=True)
    print("completed without NaN")


if __name__ == "__main__":
    main()
