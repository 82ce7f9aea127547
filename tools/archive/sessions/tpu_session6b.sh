#!/bin/bash
# Session-6b: measure the lane-expansion layout fix (compare-built
# weights/gout — kills the ~16 reshapes + ~25 layout copies the 1M trace
# attributed ~65 ms/step to), then the march_seg=8 overcommit-2.75 arm
# (PERF_PLAN item 4), then the full-scale texture gates and assembly
# sweeps carried over from session 6.
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

echo "=== session6b takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

runT 2400 bench_fix_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum"}' \
    python bench.py
runT 2400 bench_fix_l4f8_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "hash_n_levels": 4, "hash_n_features": 8}' \
    python bench.py
runT 2400 bench_seg_l4f8_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "hash_n_levels": 4, "hash_n_features": 8, "march_seg": 8, "seg_overcommit": 2.75}' \
    python bench.py

# full-scale texture gates (round-1 VERDICT item 3; l4f8 gates the new arm)
runT 5400 texture_brick python tools/validate_synthetic.py --steps 20000 \
    --scene texture --levels 8 --features 4 --impl brick \
    --out "$OUT/texture_brick"
runT 5400 texture_gather python tools/validate_synthetic.py --steps 20000 \
    --scene texture --levels 16 --features 2 --impl gather --log2 21 \
    --out "$OUT/texture_gather"
runT 5400 texture_l4f8 python tools/validate_synthetic.py --steps 20000 \
    --scene texture --levels 4 --features 8 --impl brick \
    --out "$OUT/texture_l4f8"

# assembly A/B step timings for the perf log
runT 3600 sweep_asm_xla python tools/profile_budget.py --iters 12 \
    --impls xla --march_seg 0 --budgets 262144,1048576 --assembly cumsum
runT 3600 sweep_base_xla python tools/profile_budget.py --iters 12 \
    --impls xla --march_seg 0 --budgets 262144,1048576
echo "=== session6b done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
