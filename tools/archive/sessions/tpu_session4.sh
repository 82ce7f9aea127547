#!/bin/bash
# Final round-2 chip schedule (single owner): waits for the orphaned
# sweep3_fused_xc to finish, then fused/compact sweeps + benches +
# defaults + quality gates + 12k-step texture A/B chain.
set -u
OUT=${1:-/tmp/tpu_session_r2}
cd "$(dirname "$0")/.."
runT() {
  local tmo=$1 name=$2; shift 2
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "=== $name rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
}
run() { runT 5400 "$@"; }

# wait for the orphaned sweep3_fused_xc (3 budget lines or 30 min cap)
for i in $(seq 1 60); do
  n=$(grep -c "^budget=" "$OUT/sweep3_fused_xc.log" 2>/dev/null || echo 0)
  [ "$n" -ge 3 ] && break
  sleep 30
done
echo "=== session4 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

run sweep3_fused_pc python tools/profile_budget.py --iters 10 \
    --impls fused --interp pallas --compact pallas --march_seg 0
run sweep3_xla_pc python tools/profile_budget.py --iters 10 \
    --impls xla --compact pallas --march_seg 0 --budgets 262144,1048576

run bench_fp env CEDNERF_BENCH_CFG='{"scatter_impl": "fused", "interp_impl": "pallas", "compact_impl": "pallas"}' \
    python bench.py
run bench_fp_1m env CEDNERF_BENCH_CFG='{"scatter_impl": "fused", "interp_impl": "pallas", "compact_impl": "pallas", "target_sample_batch_size": 1048576}' \
    python bench.py

run pick_defaults4 python tools/pick_bench_defaults.py "$OUT"

run val_1m python tools/validate_synthetic.py --steps 2000 \
    --budget 1048576 --scatter_impl fused --out "$OUT/val_1m"

runT 7200 texture_brick12 python tools/validate_synthetic.py --steps 12000 \
    --scene texture --levels 8 --features 4 --impl brick \
    --out "$OUT/texture_brick12"
runT 9000 texture_ref12 python tools/validate_synthetic.py --steps 12000 \
    --scene texture --levels 16 --features 2 --impl gather --log2 21 \
    --out "$OUT/texture_ref12"
runT 7200 texture_l4f8_12 python tools/validate_synthetic.py --steps 12000 \
    --scene texture --levels 4 --features 8 --impl brick \
    --out "$OUT/texture_l4f8_12"

echo "SESSION4 DONE" | tee -a "$OUT/queue.log"
