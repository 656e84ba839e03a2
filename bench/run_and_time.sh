#!/bin/bash
# MLPerf DLRM config to the 0.8025 ROC-AUC threshold, mirroring the
# reference's bench/run_and_time.sh:17 (128-dim emb, 40M ind range,
# bot 13-512-256-128, top 1024-1024-512-256-1, lr 1.0, mb 2048, bin loader).
set -e
cd "$(dirname "$0")/.."
: "${CRITEO_BIN:=./input/train.bin}"
: "${CRITEO_TEST_BIN:=./input/test.bin}"
start=$(date +%s)
python -m dlrm_yx_tpu.cli \
  --arch-sparse-feature-size=128 \
  --arch-mlp-bot=13-512-256-128 --arch-mlp-top=1024-1024-512-256-1 \
  --max-ind-range=40000000 \
  --data-generation=dataset --data-set=terabyte \
  --mlperf-bin-loader --mlperf-bin-shuffle \
  --raw-data-file="$CRITEO_BIN" --processed-data-file="$CRITEO_TEST_BIN" \
  --loss-function=bce --round-targets=True --learning-rate=1.0 \
  --mini-batch-size=2048 --print-freq=2048 --print-time \
  --test-mini-batch-size=16384 \
  --compute-dtype=bfloat16 --sparse-update-impl=pallas \
  --mlperf-logging --mlperf-auc-threshold=0.8025 \
  --lr-num-warmup-steps=2750 --lr-decay-start-step=49315 \
  --lr-num-decay-steps=27772 --test-freq=102400 "$@"
end=$(date +%s)
echo "RESULT,DLRM,$start,$(( end - start ))"
