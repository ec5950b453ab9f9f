#!/bin/bash
# Parity: experiments/scripts/train_cycle.sh — DATASET SPLITBY POSTFIX
# [CAP_LOSS_WEIGHT]; 800k iters.
set -e
DATASET=${1:-refcoco}
SPLITBY=${2:-unc}
POSTFIX=${3:-exp0}
CAP_W=${4:-0.1}
ITERS=${5:-800000}

python -m lang2seg_tpu.cli.train \
  --variant cycle \
  --dataset "$DATASET" --split-by "$SPLITBY" --id "$POSTFIX" \
  --max-iters "$ITERS" \
  --cfg experiments/cfgs/res101.yml \
  --set model.cap_loss_weight "$CAP_W"
