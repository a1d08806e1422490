#!/usr/bin/env python
"""Encoder sweep: train the same model under each encoder and compare.

Reproduces the reference's Table-I experiment shape (README.md:38-41):
full-coverage compression (activations, gradient-maps, weights, gradients,
momentum) under smart/fp8/s2fp8/fp16/bf16/fp32, tracking final accuracy,
compression ratio, and NaN-divergence.  The reference's qualitative result —
FP8/FP16/S2FP8 collapse at full coverage without loss scaling while SmaQ and
BF16 track the FP32 baseline — should reproduce on any dataset.

Defaults to a fast TinyCNN/synthetic config; pass --model resnet18 and real
data for the full reproduction.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoders", nargs="+",
                    default=["fp32", "smart", "bf16", "fp8", "s2fp8", "fp16"])
    ap.add_argument("--model", default="tiny",
                    choices=("tiny", "resnet18", "resnet34"))
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--learning_rate", type=float, default=0.05)
    ap.add_argument("--limit_train_batches", type=int)
    ap.add_argument("--out", default="encoder_sweep_results.json")
    args = ap.parse_args()

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

    results = {}
    for enc in args.encoders:
        comp = build_compressor(enc)
        tap = TapConfig(compressor=comp)
        model = model_fn(num_classes=10, tap=tap)
        data = CIFAR10Data(batch_size=args.batch_size)
        trainer = Trainer(
            model, data, build_optimizer("sgd", args.learning_rate, momentum=0.9),
            tap_cfg=tap,
            optim_comp=OptimizerCompression(compressor=comp),
            loss_compressor=comp,
            config=TrainConfig(
                epochs=args.epochs,
                log_every=10,
                measure_compression_ratio=True,
                limit_train_batches=args.limit_train_batches,
            ),
            logger=MetricLogger(None),
        )
        state = trainer.fit()
        val = trainer.evaluate(state)
        ratios = trainer.ratio_acc.summary()
        results[enc] = {
            "val_accuracy": val.get("val_accuracy"),
            "val_loss": val.get("val_loss"),
            "nan_terminated": trainer.nan_terminated,
            "compression_ratio": round(ratios.get("compression_ratio", 1.0), 3),
        }
        print(f"[{enc}] {results[enc]}", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("\nencoder            val_acc   ratio   diverged")
    for enc, r in results.items():
        acc = r["val_accuracy"]
        print(f"{enc:10s} {acc if acc is None else round(acc, 4)!s:>12} "
              f"{r['compression_ratio']:>7} {r['nan_terminated']!s:>10}")


if __name__ == "__main__":
    main()
