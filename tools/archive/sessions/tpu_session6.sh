#!/bin/bash
# Session-6 chip schedule (fresh container, tunnel confirmed up 08:18):
# quick measurement block first — a fresh 1M-budget trace of the shipped
# cumsum-assembly default plus the L4F8 structural-width bench arm
# (PERF_PLAN round-3 lever 2) — then the long full-scale texture gates
# (round-1 VERDICT item 3), then the assembly A/B sweeps for the perf log.
set -u
OUT=${1:-/tmp/r2s6}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
runT() {
  local tmo=$1 name=$2; shift 2
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "=== $name rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
}

echo "=== session6 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

# --- block A: quick measurements ---------------------------------------
runT 2400 trace_default_1m python tools/profile_trace.py \
    --cfg '{"target_sample_batch_size": 1048576}' \
    --out "$OUT/trace_default_1m" --top 48
runT 2400 bench_l4f8_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "hash_n_levels": 4, "hash_n_features": 8}' \
    python bench.py
runT 2400 bench_l4f8_2m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 2097152, "assembly_impl": "cumsum", "hash_n_levels": 4, "hash_n_features": 8, "remat_feats": true}' \
    python bench.py

# --- block B: full-scale texture gates (20k steps each) ----------------
runT 5400 texture_brick python tools/validate_synthetic.py --steps 20000 \
    --scene texture --levels 8 --features 4 --impl brick \
    --out "$OUT/texture_brick"
runT 5400 texture_gather python tools/validate_synthetic.py --steps 20000 \
    --scene texture --levels 16 --features 2 --impl gather --log2 21 \
    --out "$OUT/texture_gather"
runT 5400 texture_l4f8 python tools/validate_synthetic.py --steps 20000 \
    --scene texture --levels 4 --features 8 --impl brick \
    --out "$OUT/texture_l4f8"

# --- block C: assembly A/B step timings for the perf log ---------------
runT 3600 sweep_asm_xla python tools/profile_budget.py --iters 12 \
    --impls xla --march_seg 0 --budgets 262144,1048576 --assembly cumsum
runT 3600 sweep_base_xla python tools/profile_budget.py --iters 12 \
    --impls xla --march_seg 0 --budgets 262144,1048576
echo "=== session6 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
