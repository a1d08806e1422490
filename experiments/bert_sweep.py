#!/usr/bin/env python
"""BERT/STSB encoder sweep: the second axis of the reference's Table I
(README.md:38-41 / images/results.png): full-coverage compression of a BERT
regression fine-tune under each encoder, tracking mean(Pearson, Spearman),
compression ratio, and NaN divergence.

Real GLUE and pretrained bert-base weights are unavailable offline, so this
trains the tiny BERT config from scratch on the synthetic STSB stand-in
(data/glue.py: sentence-overlap-correlated labels) — the reference's
qualitative result to reproduce is SmaQ/BF16/FP16 tracking FP32 with FP8
degrading (0.766 vs 0.793).

  python experiments/bert_sweep.py --epochs 30 --batch_size 64 \
      --out experiments/results/bert_sweep_stsb_synthetic.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _HistoryLogger:
    def __init__(self):
        self.history = []

    def log(self, step, scalars, echo=True):
        if "val_pearson_spearman_mean" in scalars and "epoch" in scalars:
            self.history.append(
                {
                    "epoch": int(scalars["epoch"]),
                    "val_corr": round(
                        float(scalars["val_pearson_spearman_mean"]), 4
                    ),
                    "val_loss": round(float(scalars["val_loss"]), 4),
                }
            )


def parse_encoder_spec(spec: str):
    """'smart' or 'smart@nomom,nofwd' — base encoder plus coverage ablations.

    Ablation tokens (for root-causing instability, VERDICT r3 missing #1):
      nofwd / nobwd      — disable forward / backward (gradient-map) taps
      noweights / nograds / nomom — disable that optimizer-side structure
      nonu               — momentum quantization skips Adam's second moment
                           (the only all_positive call site) but keeps mu
      rowmom             — per-row momentum stats (--momentum_rowwise)
      lognu              — log2-domain nu codec (--momentum_log_nu)
      rowlognu           — per-row log2 nu stats (--momentum_log_nu_rowwise,
                           implies lognu)
      optonly            — taps fully off (optimizer-side only)
      fwdonly            — taps forward-only, optimizer-side off
    """
    base, _, abl = spec.partition("@")
    toggles = {
        "compress_forward": True, "compress_backward": True,
        "compress_weights": True, "compress_gradients": True,
        "compress_momentum": True, "skip_nu": False, "rowwise": False,
        "log_nu": False, "log_nu_rowwise": False,
    }
    for tok in filter(None, abl.split(",")):
        if tok == "nofwd":
            toggles["compress_forward"] = False
        elif tok == "nobwd":
            toggles["compress_backward"] = False
        elif tok == "noweights":
            toggles["compress_weights"] = False
        elif tok == "nograds":
            toggles["compress_gradients"] = False
        elif tok == "nomom":
            toggles["compress_momentum"] = False
        elif tok == "nonu":
            toggles["skip_nu"] = True
        elif tok == "rowmom":
            toggles["rowwise"] = True
        elif tok == "lognu":
            toggles["log_nu"] = True
        elif tok == "rowlognu":
            toggles["log_nu"] = True
            toggles["log_nu_rowwise"] = True
        elif tok == "optonly":
            toggles["compress_forward"] = toggles["compress_backward"] = False
        elif tok == "fwdonly":
            toggles["compress_backward"] = False
            toggles["compress_weights"] = False
            toggles["compress_gradients"] = False
            toggles["compress_momentum"] = False
        else:
            raise ValueError(f"unknown ablation token {tok!r} in {spec!r}")
    return base, toggles


def make_skip_nu(inner):
    """Wrap a compressor so all_positive calls (exactly Adam's nu,
    optim/compressed.py::_map_momentum_state) pass through unquantized."""
    import dataclasses as _dc

    from smart_quantization_tpu.compress.base import SizeStats

    @_dc.dataclass(frozen=True)
    class _SkipNu:
        inner: object

        @property
        def name(self):
            return getattr(self.inner, "name", "wrapped")

        @property
        def params(self):
            return getattr(self.inner, "params", None)

        def __call__(self, x, key, *, all_positive=False, **kw):
            if all_positive:
                return x, SizeStats.of(x.size, 32, 32)
            return self.inner(x, key, all_positive=all_positive, **kw)

    return _SkipNu(inner)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoders", nargs="+",
                    default=["fp32", "smart", "bf16", "fp8", "s2fp8", "fp16"])
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--val_batch_size", type=int, default=256)
    # reference fine-tune regime (README.md:58): AdamW lr 2e-5, wd 0.01,
    # eps 1e-8.  2e-5 is for a PRETRAINED bert-base; the from-scratch
    # bert-tiny default here is scaled up but stays in the stable AdamW
    # band (the round-3 sweep's 1e-3 made 4/6 encoders diverge and
    # measured regime brutality, not encoder fidelity)
    ap.add_argument("--learning_rate", type=float, default=2e-4)
    ap.add_argument("--weight_decay", type=float, default=0.01)
    ap.add_argument("--epsilon", type=float, default=1e-8)
    ap.add_argument("--max_input_length", type=int, default=32)
    ap.add_argument("--train_n", type=int, default=4096)
    ap.add_argument("--val_n", type=int, default=1024)
    ap.add_argument("--steps_per_call", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    # The reference's BERT/STSB row is a FINE-TUNE of pretrained weights
    # (README.md:58) — pretrained bert-base is offline-unavailable, so the
    # stand-in is W epochs of FP32 training (shared trajectory, same seed)
    # before switching to the encoder under test.  0 = from-scratch.
    ap.add_argument("--fp32_warmup_epochs", type=int, default=0)
    ap.add_argument("--warmup_learning_rate", type=float, default=None,
                    help="lr for the warmup phase (default: --learning_rate)")
    ap.add_argument("--warmup_ramp_epochs", type=int, default=0,
                    help="linear LR ramp 0 -> warmup_lr over the first N "
                         "warmup epochs; post-LN BERT at bert-base DEPTH "
                         "(12 layers) diverges from scratch without one "
                         "(the canonical BERT recipe also ramps)")
    # model dims (default: bert-tiny).  --hidden 768 --heads 12
    # --intermediate 3072 tests at the reference's bert-base width
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--heads", type=int, default=2)
    ap.add_argument("--intermediate", type=int, default=128)
    ap.add_argument("--out", default="bert_sweep_results.json")
    args = ap.parse_args()

    from smart_quantization_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

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
    )
    from smart_quantization_tpu.train.bert_loop import BertTrainer
    from smart_quantization_tpu.train.loop import TrainConfig

    results = {
        "_meta": {
            "model": "bert-tiny (from scratch; pretrained weights are "
                     "offline-unavailable)",
            "task": "stsb-synthetic",
            "epochs": args.epochs,
            "batch_size": args.batch_size,
            "learning_rate": args.learning_rate,
            "weight_decay": args.weight_decay,
            "epsilon": args.epsilon,
            "seed": args.seed,
            "backend": jax.default_backend(),
            "coverage": "forward+backward+weights+gradients+momentum (full) "
                        "unless the encoder spec carries @ablations",
        }
    }
    model_cfg = BertConfig(
        vocab_size=30522, hidden_size=args.hidden, num_layers=args.layers,
        num_heads=args.heads, intermediate_size=args.intermediate,
        max_position_embeddings=512,
    )
    results["_meta"]["model_dims"] = (
        f"L{args.layers} H{args.hidden} A{args.heads} I{args.intermediate}"
    )

    warm_params = None
    if args.fp32_warmup_epochs > 0:
        # one shared FP32 "pretraining" trajectory; every encoder fine-tunes
        # from the SAME params with a fresh optimizer (the reference
        # fine-tunes pretrained weights with a fresh AdamW, README.md:58)
        import jax as _jax

        wdata = GLUEData(
            task="stsb", batch_size=args.batch_size,
            val_batch_size=args.val_batch_size,
            max_input_length=args.max_input_length,
            synthetic_train=args.train_n, synthetic_val=args.val_n,
        )
        wmodel = BertForSequenceClassification(
            model_cfg, num_labels=wdata.num_labels, tap=None
        )
        wlr = args.warmup_learning_rate or args.learning_rate
        if args.warmup_ramp_epochs > 0:
            import optax

            spe = max(args.train_n // args.batch_size, 1)
            wlr = optax.linear_schedule(
                0.0, wlr, args.warmup_ramp_epochs * spe
            )
        wlogger = _HistoryLogger()
        wtrainer = BertTrainer(
            wmodel, wdata,
            build_optimizer(
                "adamw", wlr,
                weight_decay=args.weight_decay, epsilon=args.epsilon,
            ),
            tap_cfg=None,
            optim_comp=OptimizerCompression(compressor=None),
            config=TrainConfig(
                epochs=args.fp32_warmup_epochs, log_every=200,
                steps_per_call=args.steps_per_call, seed=args.seed,
            ),
            logger=wlogger, task="stsb",
        )
        wstate = wtrainer.fit()
        wval = wtrainer.evaluate(wstate)
        warm_params = _jax.device_get(wstate.params)
        results["_meta"]["fp32_warmup_epochs"] = args.fp32_warmup_epochs
        results["_meta"]["warmup_ramp_epochs"] = args.warmup_ramp_epochs
        results["_meta"]["warmup_final_correlation"] = round(
            wval.get("val_pearson_spearman_mean", float("nan")), 4
        )
        results["_meta"]["warmup_history"] = wlogger.history
        print(f"[warmup] {args.fp32_warmup_epochs} fp32 epochs -> "
              f"corr={results['_meta']['warmup_final_correlation']}",
              flush=True)

    for enc in args.encoders:
        t0 = time.time()
        base, cov = parse_encoder_spec(enc)
        comp = build_compressor(base)
        tap = TapConfig(
            compressor=comp,
            compress_forward=cov["compress_forward"],
            compress_backward=cov["compress_backward"],
        )
        data = GLUEData(
            task="stsb", batch_size=args.batch_size,
            val_batch_size=args.val_batch_size,
            max_input_length=args.max_input_length,
            synthetic_train=args.train_n, synthetic_val=args.val_n,
        )
        model = BertForSequenceClassification(
            model_cfg, num_labels=data.num_labels, tap=tap
        )
        logger = _HistoryLogger()
        trainer = BertTrainer(
            model, data,
            build_optimizer(
                "adamw", args.learning_rate,
                weight_decay=args.weight_decay, epsilon=args.epsilon,
            ),
            tap_cfg=tap,
            optim_comp=OptimizerCompression(
                compressor=(make_skip_nu(comp) if cov["skip_nu"] else comp),
                compress_weights=cov["compress_weights"],
                compress_gradients=cov["compress_gradients"],
                compress_momentum=cov["compress_momentum"],
                momentum_rowwise=cov["rowwise"],
                momentum_log_nu=cov["log_nu"],
                momentum_log_nu_rowwise=cov["log_nu_rowwise"],
            ),
            loss_compressor=comp,
            config=TrainConfig(
                epochs=args.epochs,
                log_every=200,
                measure_compression_ratio=True,
                steps_per_call=args.steps_per_call,
                seed=args.seed,
            ),
            logger=logger,
            task="stsb",
        )
        if warm_params is not None:
            import jax as _jax
            import jax.numpy as _jnp

            from smart_quantization_tpu.train.state import TrainState

            key0 = _jax.random.key(args.seed)
            s0 = trainer.init_state(_jax.random.fold_in(key0, 99))
            s0 = TrainState(
                s0.step,
                _jax.tree.map(_jnp.asarray, warm_params),
                s0.batch_stats,
                s0.opt_state,
            )
            state = trainer.fit(s0)
        else:
            state = trainer.fit()
        val = trainer.evaluate(state)
        ratios = trainer.ratio_acc.summary()
        mean_corr = (
            round(val["val_pearson_spearman_mean"], 4)
            if "val_pearson_spearman_mean" in val else None
        )
        corrs = [h["val_corr"] for h in logger.history]
        tail = corrs[-(max(len(corrs) // 3, 1)):]
        results[enc] = {
            # the reference's Table-I metric: mean(Pearson, Spearman)
            "mean_correlation": mean_corr,
            "val_pearson": val.get("val_pearson"),
            "val_spearman": val.get("val_spearmanr"),
            "val_loss": val.get("val_loss"),
            "tail_mean_correlation": (
                round(sum(tail) / len(tail), 4) if tail else None
            ),
            "nan_terminated": trainer.nan_terminated,
            "compression_ratio": round(ratios.get("compression_ratio", 1.0), 3),
            "wall_s": round(time.time() - t0, 1),
            "history": logger.history,
        }
        print(f"[{enc}] corr={mean_corr} "
              f"ratio={results[enc]['compression_ratio']} "
              f"nan={results[enc]['nan_terminated']}", flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)

    print("\nencoder      mean_corr  tail_corr   ratio   diverged")
    for enc, r in results.items():
        if enc.startswith("_"):
            continue
        print(f"{enc:10s} {r['mean_correlation']!s:>10} "
              f"{r['tail_mean_correlation']!s:>10} "
              f"{r['compression_ratio']:>7} {r['nan_terminated']!s:>10}")


if __name__ == "__main__":
    main()
