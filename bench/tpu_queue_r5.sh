#!/bin/bash
# Round-5 device-measurement queue — run when the TPU tunnel is up.
# ORDER: standing evidence items FIRST (VERDICT round-4 item 1), each with
# its own JSON checkpoint so a cut window keeps partial rows; perf A/Bs
# after. Results land in bench/results/round5_device.log + per-bench JSON.
cd "$(dirname "$0")/.."
LOG=bench/results/round5_device.log
# persistent compile cache: relay compiles are server-side and slow (the
# quantized-eval step compiled in minutes even post-fix); cache hits make
# re-runs and resumed windows cheap
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
run() {
  local t=$1; shift
  echo "=== $* ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
  timeout "$t" "$@" 2>&1 | grep -vE "WARNING:|^I0|^E0000" | tail -40 | tee -a "$LOG"
}
# evidence (resumable: auc_scaled_5000.json / serving_table.json checkpoints)
run 3600 python bench/auc_proxy.py 5000 12 --scaled            # guard
run 1800 python bench/bench_inference.py --only int8_emb,int4_emb,int8_emb_int8_mlp
run 4800 python bench/auc_proxy.py 5000 12 --scaled --ablate   # fast-gap ablation
# headline + A/Bs (VERDICT item 3/4)
run 900  python bench.py                                       # XPlane-anchored headline
run 900  python bench.py --interaction-impl pallas             # fused interaction A/B
run 900  python bench.py --no-write-only-update                # RMW vs write-only A/B
run 900  python bench.py --emb-split-threshold 30000           # small-store migration A/B
# trainer pipeline + L=100 + capacity re-checks (items 2/5)
run 1200 python bench/fullloop_bench.py 400
run 1500 python bench/profile_l100.py
run 900  python bench/bench_stream_update.py
run 900  python bench/capacity_demo.py
echo "=== queue done ($(date -u +%H:%M:%S)) ===" | tee -a "$LOG"
