#!/bin/bash
# Criteo Kaggle DAC training to the 0.789 accuracy threshold, mirroring
# bench/dlrm_s_criteo_kaggle.sh:24 (16-dim emb, bot 13-512-256-64-16,
# top 512-256-1, bce, lr 0.1, mb 128).
# Expects preprocessed npz at $CRITEO_PREFIX (see dlrm_yx_tpu/data/criteo.py).
set -e
cd "$(dirname "$0")/.."
: "${CRITEO_PREFIX:=./input/kaggleAdDisplayChallenge_processed}"
python -m dlrm_yx_tpu.cli \
  --arch-sparse-feature-size=16 \
  --arch-mlp-bot=13-512-256-64-16 --arch-mlp-top=512-256-1 \
  --data-generation=dataset --data-set=kaggle \
  --processed-data-file="$CRITEO_PREFIX" \
  --loss-function=bce --round-targets=True --learning-rate=0.1 \
  --mini-batch-size=128 --print-freq=1024 --print-time \
  --test-mini-batch-size=16384 \
  --mlperf-acc-threshold=0.789 --test-freq=30000 "$@"
