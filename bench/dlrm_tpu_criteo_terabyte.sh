#!/bin/bash
# Criteo Terabyte (0.875 sub-sampled) to the 0.8107 accuracy threshold,
# mirroring bench/dlrm_s_criteo_terabyte.sh:24 (64-dim emb, 10M ind range,
# bot 13-512-256-64, top 512-512-256-1, mb 2048, lr 0.1).
set -e
cd "$(dirname "$0")/.."
: "${CRITEO_PREFIX:=./input/terabyte_processed}"
python -m dlrm_yx_tpu.cli \
  --arch-sparse-feature-size=64 \
  --arch-mlp-bot=13-512-256-64 --arch-mlp-top=512-512-256-1 \
  --max-ind-range=10000000 --data-sub-sample-rate=0.875 \
  --data-generation=dataset --data-set=terabyte \
  --processed-data-file="$CRITEO_PREFIX" \
  --loss-function=bce --round-targets=True --learning-rate=0.1 \
  --mini-batch-size=2048 --print-freq=1024 --print-time \
  --test-mini-batch-size=16384 \
  --compute-dtype=bfloat16 --sparse-update-impl=pallas \
  --mlperf-acc-threshold=0.8107 --test-freq=10000 "$@"
