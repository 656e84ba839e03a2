#!/bin/bash
# Synthetic throughput benchmark, mirroring the reference's
# bench/dlrm_s_benchmark.sh:20-59 config (8 x 1M-row 64-dim tables,
# 100 indices/lookup, mb 2048, bot 512-512-64, top 1024-1024-1024-1).
# Usage: bench/dlrm_tpu_benchmark.sh [extra CLI args...]
set -e
cd "$(dirname "$0")/.."
python -m dlrm_yx_tpu.cli \
  --arch-sparse-feature-size=64 \
  --arch-embedding-size=1000000-1000000-1000000-1000000-1000000-1000000-1000000-1000000 \
  --arch-mlp-bot=512-512-64 \
  --arch-mlp-top=1024-1024-1024-1 \
  --arch-interaction-op=dot \
  --data-generation=random-device \
  --num-indices-per-lookup=100 \
  --mini-batch-size=2048 --num-batches=100 \
  --loss-function=bce --round-targets=True --learning-rate=0.1 \
  --compute-dtype=bfloat16 --sparse-update-impl=pallas \
  --print-freq=10 --print-time "$@"
