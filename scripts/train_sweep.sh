#!/usr/bin/env bash
# Encoder sweep on ResNet/CIFAR-10 — the reference's scripts/train.ps1
# equivalents, against our CLI.  Usage: scripts/train_sweep.sh [epochs]
set -euo pipefail
cd "$(dirname "$0")/.."
EPOCHS="${1:-250}"
COMMON=(--model resnet --resnet_model resnet34 --dataset cifar10
        --batch_size 128 --max_epochs "$EPOCHS" --scheduler_type multi_step
        --measure_compression_ratio --logdir lightning_logs)

for enc in smart fp8 s2fp8 fp16 bf16 fp32; do
  echo "=== $enc ==="
  python train.py "${COMMON[@]}" --compress "$enc" --tags "sweep-$enc"
done
