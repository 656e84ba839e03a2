#!/bin/bash
# Round-4 device-measurement queue — run when the TPU tunnel is up.
# Each item is independently timeboxed; failures don't block the rest.
# Results land in bench/results/round4_device.log (and each bench's own
# JSON outputs). VERDICT round-3 items: 2 (bf16 breakdown), 5 (queued
# measurements), 6 (stream kernel), 7 (fused dense finish headline), 4
# (full-loop wall), 9 (semantics at scale).
cd "$(dirname "$0")/.."
LOG=bench/results/round4_device.log
run() {
  local t=$1; shift
  echo "=== $* ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | grep -vE "WARNING:|^I0|^E0000" | tail -40 | tee -a "$LOG"
}
run 900  python bench/bench_stream_update.py       # 4-way RMW A/B (item 6)
run 900  python bench/profile_headline.py          # fused finish effect (7)
run 600  python bench.py                           # headline JSON
run 1200 python bench/profile_bf16.py              # bf16 breakdown (item 2)
run 900  python bench/capacity_demo.py             # bf16 ex/s
run 1200 python bench/profile_l100.py              # L=100 end-to-end (6)
run 1200 python bench/bench_inference.py           # serving table (5)
run 900  python bench/fullloop_bench.py 400        # wall ms/it (4)
run 3000 python bench/auc_proxy.py 5000 --scaled   # semantics at scale (9)
echo "=== queue done ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
