#!/bin/bash
# Round-2 timing block: the fused/pallas combos after the tile-256 +
# lane-major-compact fixes. Waits for the orphaned texture_brick arm to
# free the chip, runs the timing-sensitive sweeps/benches on a quiet
# chip, re-picks bench defaults, runs the 1M quality gate, then starts
# the long reference-exact texture arm.
set -u
OUT=${1:-/tmp/tpu_session_r2}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

runT() {
  local tmo=$1 name=$2; shift 2
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "=== $name rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
}
run() { runT 5400 "$@"; }

# wait (<= 95 min) for the orphaned texture_brick run to finish
for i in $(seq 1 190); do
  [ -f "$OUT/texture_brick/result.json" ] && break
  sleep 30
done
echo "=== chip assumed free ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

run sweep3_fused_xc python tools/profile_budget.py --iters 10 \
    --impls fused --interp pallas --compact xla --march_seg 0
run sweep3_fused_pc python tools/profile_budget.py --iters 10 \
    --impls fused --interp pallas --compact pallas --march_seg 0
# isolate the compact kernel's in-program delta on the xla base
run sweep3_xla_pc python tools/profile_budget.py --iters 10 \
    --impls xla --compact pallas --march_seg 0 --budgets 262144,1048576

run bench_fp env CEDNERF_BENCH_CFG='{"scatter_impl": "fused", "interp_impl": "pallas", "compact_impl": "pallas"}' \
    python bench.py
run bench_fp_1m env CEDNERF_BENCH_CFG='{"scatter_impl": "fused", "interp_impl": "pallas", "compact_impl": "pallas", "target_sample_batch_size": 1048576}' \
    python bench.py

run pick_defaults3 python tools/pick_bench_defaults.py "$OUT"

# quality gate for the 1M-budget promotion (val_1m failed pre-fix)
run val_1m python tools/validate_synthetic.py --steps 2000 \
    --budget 1048576 --scatter_impl fused --out "$OUT/val_1m"

# reference-exact texture arm (the 20k brick arm already ran)
runT 14400 texture_ref python tools/validate_synthetic.py --steps 20000 \
    --scene texture --levels 16 --features 2 --impl gather --log2 21 \
    --out "$OUT/texture_ref"

echo "QUEUE3 DONE" | tee -a "$OUT/queue.log"
