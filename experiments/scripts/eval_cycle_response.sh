#!/bin/bash
# Parity: experiments/scripts/eval_cycle_response.sh — loops val/testA/testB.
set -e
DATASET=${1:-refcoco}
SPLITBY=${2:-unc}
POSTFIX=${3:-exp0}
shift 3 || true
SPLITS=${@:-val testA testB}

python -m lang2seg_tpu.cli.eval \
  --variant cycle_response \
  --dataset "$DATASET" --split-by "$SPLITBY" --id "$POSTFIX" \
  --splits $SPLITS \
  --cfg experiments/cfgs/res101.yml
