#!/usr/bin/env python
"""Encoder sweep: train the same model under each encoder and compare.

Reproduces the reference's Table-I experiment shape (README.md:38-41):
full-coverage compression (activations, gradient-maps, weights, gradients,
momentum) under smart/fp8/s2fp8/fp16/bf16/fp32, tracking final accuracy,
compression ratio, and NaN-divergence.  The reference's qualitative result —
FP8/FP16/S2FP8 collapse at full coverage without loss scaling while SmaQ and
BF16 track the FP32 baseline — should reproduce on any dataset.

Real CIFAR is unavailable offline; the synthetic stand-in is made hard
enough to separate encoders with SMAQ_SYNTH_* (see data/cifar.py): e.g.

  SMAQ_SYNTH_TRAIN_N=8192 SMAQ_SYNTH_TEST_N=1024 SMAQ_SYNTH_SHIFT=6 \
    python experiments/encoder_sweep.py --model resnet18 --epochs 40 \
      --batch_size 128 --steps_per_call 16 \
      --out experiments/results/encoder_sweep_resnet18_synthetic.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _HistoryLogger:
    """MetricLogger wrapper capturing the per-epoch validation curve."""

    def __init__(self, inner):
        self.inner = inner
        self.history = []

    def log(self, step, scalars, echo=True):
        if "val_accuracy" in scalars and "epoch" in scalars:
            self.history.append(
                {
                    "epoch": int(scalars["epoch"]),
                    "val_accuracy": round(float(scalars["val_accuracy"]), 4),
                    "val_loss": round(float(scalars["val_loss"]), 4),
                }
            )
        self.inner.log(step, scalars, echo=echo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoders", nargs="+",
                    default=["fp32", "smart", "bf16", "fp8", "s2fp8", "fp16"])
    ap.add_argument("--model", default="tiny",
                    choices=("tiny", "resnet18", "resnet34"))
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--val_batch_size", type=int)
    ap.add_argument("--learning_rate", type=float, default=0.1)
    ap.add_argument("--limit_train_batches", type=int)
    ap.add_argument("--steps_per_call", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="encoder_sweep_results.json")
    args = ap.parse_args()

    from smart_quantization_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from smart_quantization_tpu.compress import build_compressor
    from smart_quantization_tpu.data.cifar import CIFAR10Data
    from smart_quantization_tpu.inject.tap import TapConfig
    from smart_quantization_tpu.models.resnet import resnet18, resnet34
    from smart_quantization_tpu.models.tiny import TinyCNN
    from smart_quantization_tpu.optim.compressed import (
        OptimizerCompression,
        build_optimizer,
    )
    from smart_quantization_tpu.train.loop import TrainConfig, Trainer
    from smart_quantization_tpu.train.metrics import MetricLogger

    model_fn = {
        "tiny": TinyCNN,
        "resnet18": resnet18,
        "resnet34": resnet34,
    }[args.model]

    results = {
        "_meta": {
            "model": args.model,
            "epochs": args.epochs,
            "batch_size": args.batch_size,
            "learning_rate": args.learning_rate,
            "seed": args.seed,
            "backend": jax.default_backend(),
            "synth_train_n": os.environ.get("SMAQ_SYNTH_TRAIN_N", "2048"),
            "synth_shift": os.environ.get("SMAQ_SYNTH_SHIFT", "default"),
            "coverage": "forward+backward+weights+gradients+momentum (full)",
        }
    }
    for enc in args.encoders:
        t0 = time.time()
        comp = build_compressor(enc)
        tap = TapConfig(compressor=comp)
        model = model_fn(num_classes=10, tap=tap)
        data = CIFAR10Data(batch_size=args.batch_size,
                           val_batch_size=args.val_batch_size)
        logger = _HistoryLogger(MetricLogger(None))
        trainer = Trainer(
            model, data, build_optimizer("sgd", args.learning_rate, momentum=0.9),
            tap_cfg=tap,
            optim_comp=OptimizerCompression(compressor=comp),
            loss_compressor=comp,
            config=TrainConfig(
                epochs=args.epochs,
                log_every=50,
                measure_compression_ratio=True,
                limit_train_batches=args.limit_train_batches,
                steps_per_call=args.steps_per_call,
                seed=args.seed,
            ),
            logger=logger,
        )
        state = trainer.fit()
        val = trainer.evaluate(state)
        ratios = trainer.ratio_acc.summary()
        # tail stability: constant-lr full-coverage runs oscillate (the
        # reference trains 250 epochs at lr 0.1 with no scheduler,
        # scripts/train.ps1); the tail mean/min separate encoders that a
        # single final-epoch read-out would conflate
        accs = [h["val_accuracy"] for h in logger.history]
        tail = accs[-(max(len(accs) // 3, 1)):]
        results[enc] = {
            "val_accuracy": val.get("val_accuracy"),
            "val_loss": val.get("val_loss"),
            "tail_mean_accuracy": round(sum(tail) / len(tail), 4) if tail else None,
            "tail_min_accuracy": round(min(tail), 4) if tail else None,
            "tail_frac_below_half": (
                round(sum(a < 0.5 for a in tail) / len(tail), 4) if tail else None
            ),
            "nan_terminated": trainer.nan_terminated,
            "compression_ratio": round(ratios.get("compression_ratio", 1.0), 3),
            "wall_s": round(time.time() - t0, 1),
            "history": logger.history,
        }
        print(f"[{enc}] acc={results[enc]['val_accuracy']} "
              f"ratio={results[enc]['compression_ratio']} "
              f"nan={results[enc]['nan_terminated']}", flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)  # checkpoint after every encoder

    print("\nencoder            val_acc  tail_mean   ratio   diverged")
    for enc, r in results.items():
        if enc.startswith("_"):
            continue
        acc = r["val_accuracy"]
        print(f"{enc:10s} {acc if acc is None else round(acc, 4)!s:>12} "
              f"{r['tail_mean_accuracy']!s:>10} "
              f"{r['compression_ratio']:>7} {r['nan_terminated']!s:>10}")


if __name__ == "__main__":
    main()
