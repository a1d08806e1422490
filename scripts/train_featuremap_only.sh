#!/usr/bin/env bash
# Feature-map-only SmaQ bit sweep on ResNet-50 — the reference's
# scripts/train-featuremaponly.ps1: compression of forward activations only
# (backward/weights/gradients/momentum disabled), bits (3,3) (3,4) (2,3) (3,5).
set -euo pipefail
cd "$(dirname "$0")/.."
EPOCHS="${1:-250}"
for bits in "3 3" "3 4" "2 3" "3 5"; do
  set -- $bits
  echo "=== featuremap-only SmaQ main=$1 outlier=$2 ==="
  python train.py --model resnet --resnet_model resnet50 --dataset cifar10 \
    --compress smart --num_bits_main "$1" --num_bits_outlier "$2" \
    --no_compress_backward --no_compress_weights --no_compress_gradients \
    --no_compress_momentum_vectors \
    --batch_size 128 --max_epochs "$EPOCHS" --measure_compression_ratio \
    --tags "fm-only-$1-$2"
done
