#!/usr/bin/env python
"""Localize SmaQ/BERT optimizer-state-quantization damage.

Two modes:
- from-scratch (--fp32_warmup_epochs 0): catch the NaN blowup (r4 ablation:
  full coverage at lr>=2e-4 NaNs from the plateau);
- warmup + fine-tune (the reference's experiment shape): train W epochs with
  no compression, then fine-tune under full-coverage SmaQ and report WHICH
  param leaves drift (per-leaf max |delta| vs the warm params, val
  correlation per epoch, nu/mu extrema).

  python experiments/bert_nan_probe.py --fp32_warmup_epochs 60 \
      --learning_rate 2e-5 --epochs 10
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--learning_rate", type=float, default=2e-5)
    ap.add_argument("--warmup_learning_rate", type=float, default=2e-4)
    ap.add_argument("--weight_decay", type=float, default=0.01)
    ap.add_argument("--epsilon", type=float, default=1e-8)
    ap.add_argument("--fp32_warmup_epochs", type=int, default=60)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--max_input_length", type=int, default=32)
    ap.add_argument("--train_n", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--top_k", type=int, default=8)
    ap.add_argument("--skip_nu", action="store_true",
                    help="pass Adam's nu through unquantized")
    ap.add_argument("--skip_mu", action="store_true",
                    help="pass Adam's mu through unquantized")
    args = ap.parse_args()

    from smart_quantization_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from smart_quantization_tpu.compress import build_compressor
    from smart_quantization_tpu.compress.base import SizeStats
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
    from smart_quantization_tpu.train.glue_metrics import glue_metrics
    from smart_quantization_tpu.train.task import SequenceClassificationTask

    comp = build_compressor("smart")

    if args.skip_nu or args.skip_mu:
        # nu is the ONLY all_positive call site (optim/compressed.py:227);
        # mu-skipping applies to momentum only because this wrapper is used
        # for the optimizer compressor — taps get the raw comp
        @dataclasses.dataclass(frozen=True)
        class _Selective:
            inner: object
            skip_ap: bool
            skip_not_ap: bool

            @property
            def name(self):
                return self.inner.name

            @property
            def params(self):
                return getattr(self.inner, "params", None)

            def __call__(self, x, key, *, all_positive=False, **kw):
                if (all_positive and self.skip_ap) or (
                    not all_positive and self.skip_not_ap
                ):
                    return x, SizeStats.of(x.size, 32, 32)
                return self.inner(x, key, all_positive=all_positive, **kw)

        mom_comp = _Selective(comp, args.skip_nu, args.skip_mu)
    else:
        mom_comp = comp

    tap = TapConfig(compressor=comp)
    optim_comp = OptimizerCompression(compressor=mom_comp)
    data = GLUEData(
        task="stsb", batch_size=args.batch_size,
        max_input_length=args.max_input_length,
        synthetic_train=args.train_n, synthetic_val=512,
    )
    model = BertForSequenceClassification(
        BertConfig.tiny(), num_labels=data.num_labels, tap=tap
    )
    model_plain = BertForSequenceClassification(
        BertConfig.tiny(), num_labels=data.num_labels, tap=None
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

    def make_step(use_comp, spec):
        oc = optim_comp if use_comp else OptimizerCompression(compressor=None)
        mdl = model if use_comp else model_plain

        @jax.jit
        def step(params, opt_state, inputs, labels, key):
            k_fwd, k_opt, k_data = jax.random.split(key, 3)

            def loss_fn(p):
                logits = mdl.apply(
                    {"params": p}, *task.model_args(inputs), train=True,
                    rngs=task.train_rngs(k_fwd, k_data),
                )
                return task.loss(logits, labels)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            exempt = norm_param_mask(params)
            new_params, new_opt, _ = compressed_optimizer_step(
                spec, params, grads, opt_state, k_opt, oc,
                weight_exempt=exempt,
            )
            return new_params, new_opt, loss

        return step

    @jax.jit
    def eval_preds(params, inputs):
        logits = model_plain.apply(
            {"params": params}, *task.model_args(inputs), train=False,
        )
        return logits[:, 0]

    def correlation(params):
        preds, labels = [], []
        for batch in data.val_batches():
            ins, lb = task.split_batch(batch)
            preds.append(np.asarray(eval_preds(
                params, jax.tree.map(jnp.asarray, ins))))
            labels.append(np.asarray(lb))
        m = glue_metrics("stsb", np.concatenate(preds), np.concatenate(labels))
        return m["pearson_spearman_mean"]

    def run_epochs(step, params, opt_state, n_epochs, seed0, label):
        i = 0
        for ep in range(n_epochs):
            for batch in data.train_batches(seed0 + ep):
                ins, lb = task.split_batch(batch)
                params, opt_state, loss = step(
                    params, opt_state, jax.tree.map(jnp.asarray, ins),
                    jnp.asarray(lb), jax.random.fold_in(key, 7000 + i),
                )
                i += 1
            if ep % 10 == 9 or ep == n_epochs - 1:
                print(f"[{label}] epoch {ep} loss={float(loss):.4f} "
                      f"corr={correlation(params):.4f}", flush=True)
        return params, opt_state

    wspec = build_optimizer("adamw", args.warmup_learning_rate,
                            weight_decay=args.weight_decay,
                            epsilon=args.epsilon)
    if args.fp32_warmup_epochs:
        wstep = make_step(False, wspec)
        params, _ = run_epochs(
            wstep, params, wspec.tx.init(params),
            args.fp32_warmup_epochs, args.seed, "warmup",
        )
    warm = jax.device_get(params)

    spec = build_optimizer("adamw", args.learning_rate,
                           weight_decay=args.weight_decay,
                           epsilon=args.epsilon)
    fstep = make_step(True, spec)
    opt_state = spec.tx.init(params)

    def leaf_drift_report(params, opt_state, tag):
        drifts = []
        flat_w = jax.tree_util.tree_flatten_with_path(warm)[0]
        flat_p = jax.tree_util.tree_flatten_with_path(jax.device_get(params))[0]
        for (pw, w), (pp, p) in zip(flat_w, flat_p):
            d = np.abs(np.asarray(p) - np.asarray(w))
            scale = np.abs(np.asarray(w)).max() + 1e-12
            drifts.append((float(d.max()), float(d.max() / scale),
                           jax.tree_util.keystr(pw)))
        drifts.sort(reverse=True)
        print(f"--- top leaf drift ({tag}); (abs, rel-to-warm-max, leaf):")
        for a, r, name in drifts[: args.top_k]:
            print(f"  {a:9.4f}  {r:8.2f}x  {name}", flush=True)
        sts = [
            s for s in jax.tree.leaves(
                opt_state,
                is_leaf=lambda s: isinstance(s, optax.ScaleByAdamState))
            if isinstance(s, optax.ScaleByAdamState)
        ]
        if sts:
            nus = jax.device_get(sts[0].nu)
            mus = jax.device_get(sts[0].mu)
            zero_nu = [
                (float((np.asarray(n) == 0).mean()), jax.tree_util.keystr(p))
                for (p, n) in jax.tree_util.tree_flatten_with_path(nus)[0]
            ]
            zero_nu.sort(reverse=True)
            print(f"--- leaves by fraction of EXACT-ZERO nu ({tag}):")
            for frac, name in zero_nu[: args.top_k]:
                print(f"  {frac:6.3f}  {name}", flush=True)
            mu_max = max(
                float(np.abs(np.asarray(m)).max())
                for m in jax.tree.leaves(mus)
            )
            print(f"max|mu| = {mu_max:.3e}")

    i = 0
    for ep in range(args.epochs):
        for batch in data.train_batches(1000 + args.seed + ep):
            ins, lb = task.split_batch(batch)
            params, opt_state, loss = fstep(
                params, opt_state, jax.tree.map(jnp.asarray, ins),
                jnp.asarray(lb), jax.random.fold_in(key, 90_000 + i),
            )
            i += 1
        c = correlation(params)
        print(f"[finetune] epoch {ep} loss={float(loss):.4f} corr={c:.4f}",
              flush=True)
        if not np.isfinite(float(loss)) or ep == args.epochs - 1 or c < 0.3:
            leaf_drift_report(params, opt_state, f"epoch {ep}")
            if not np.isfinite(float(loss)) or c < 0.3:
                break
    print("done")


if __name__ == "__main__":
    main()
