#!/bin/bash
# Session-6c: measure the one-hot dense scatter + empty-space-skipping
# lattice (steady_march_steps) on top of the L4F8+layout-fix arm, quality-
# gate the skip lattice (identical samples when covered; gate = equal-step
# PSNR parity + complete_frac), trace the winner for next-session
# targeting, then promote bench defaults.
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

echo "=== session6c takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

runT 2400 bench_sm512_l4f8_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "hash_n_levels": 4, "hash_n_features": 8, "steady_march_steps": 512}' \
    python bench.py
runT 2400 bench_oh_l4f8_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "hash_n_levels": 4, "hash_n_features": 8}' \
    python bench.py
runT 2400 bench_sm384_l4f8_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "hash_n_levels": 4, "hash_n_features": 8, "steady_march_steps": 384}' \
    python bench.py

# quality gate: the skip lattice trains to the same PSNR (samples are
# identical when covered; complete_frac telemetry in the log)
runT 3600 val_sm512 python tools/validate_synthetic.py --steps 2000 \
    --levels 4 --features 8 --steady_march 512 --out "$OUT/val_sm512"
runT 3600 val_l4f8 python tools/validate_synthetic.py --steps 2000 \
    --levels 4 --features 8 --out "$OUT/val_l4f8"

# trace the winning config for the next optimization round
runT 2400 trace_l4f8_sm python tools/profile_trace.py \
    --cfg '{"target_sample_batch_size": 1048576, "hash_n_levels": 4, "hash_n_features": 8, "steady_march_steps": 512}' \
    --out "$OUT/trace_l4f8_sm" --top 60
echo "=== session6c done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
