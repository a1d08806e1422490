#!/usr/bin/env bash
# BERT/STSB SmaQ fine-tune — the reference README's canonical BERT run
# (README.md:58): SmaQ 6/8, AdamW with compressed optimizer state.
set -euo pipefail
cd "$(dirname "$0")/.."
python train.py --model bert --dataset glue --glue_task stsb \
  --compress smart --num_bits_main 6 --num_bits_outlier 8 \
  --optimizer_type adamw --learning_rate 2e-5 --weight_decay 0.01 \
  --batch_size 32 --max_epochs "${1:-3}" --measure_compression_ratio \
  --tags bert-stsb-smaq
