#!/bin/bash
# Parity: experiments/scripts/train_baseline.sh — positional args
# DATASET SPLITBY OUTPUT_POSTFIX (no GPU_ID: device selection is JAX's).
set -e
DATASET=${1:-refcoco}
SPLITBY=${2:-unc}
POSTFIX=${3:-exp0}
ITERS=${4:-600000}

python -m lang2seg_tpu.cli.train \
  --variant baseline \
  --dataset "$DATASET" --split-by "$SPLITBY" --id "$POSTFIX" \
  --max-iters "$ITERS" \
  --cfg experiments/cfgs/res101.yml
