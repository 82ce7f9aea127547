#!/bin/bash
# Session-6d: consolidated clean re-run after the session6/6b double-runner
# contention (see queue.log 09:05-10:25): flagship benches (uncontended
# numbers for promotion), equal-step 4k texture A/B (the 20k gather arm
# doesn't fit a chip session: ~10x slower per step than brick), the 20k
# L4F8 anchor, skip-lattice quality gates, and the post-everything trace.
# Writes its own PID to $OUT/runner.pid and each child's to child.pid so
# cleanup never has to match process names.
set -u
OUT=${1:-/tmp/r2s6}
mkdir -p "$OUT"
echo $$ > "$OUT/runner.pid"
cd "$(dirname "$0")/.."
runT() {
  local tmo=$1 name=$2; shift 2
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1 &
  echo $! > "$OUT/child.pid"
  wait $!
  echo "=== $name rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
}

echo "=== session6d takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

# --- clean flagship benches (one-hot dense grads now in the xla path) ---
runT 2400 bench_oh_l4f8_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "hash_n_levels": 4, "hash_n_features": 8}' \
    python bench.py
runT 2400 bench_sm512_l4f8_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "hash_n_levels": 4, "hash_n_features": 8, "steady_march_steps": 512}' \
    python bench.py
runT 2400 bench_sm384_l4f8_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "hash_n_levels": 4, "hash_n_features": 8, "steady_march_steps": 384}' \
    python bench.py

# --- equal-step 4k texture A/B (collision/aliasing regime) -------------
runT 5400 texture_gather_4k python tools/validate_synthetic.py --steps 4000 \
    --scene texture --levels 16 --features 2 --impl gather --log2 21 \
    --out "$OUT/texture_gather_4k"
runT 1800 texture_brick_4k python tools/validate_synthetic.py --steps 4000 \
    --scene texture --levels 8 --features 4 --impl brick \
    --out "$OUT/texture_brick_4k"
runT 1800 texture_l4f8_4k python tools/validate_synthetic.py --steps 4000 \
    --scene texture --levels 4 --features 8 --impl brick \
    --out "$OUT/texture_l4f8_4k"

# --- 20k L4F8 anchor (vs texture_brick's 20k eval 19.81) ---------------
runT 5400 texture_l4f8 python tools/validate_synthetic.py --steps 20000 \
    --scene texture --levels 4 --features 8 --impl brick \
    --out "$OUT/texture_l4f8"

# --- skip-lattice quality gate (identical samples when covered) --------
runT 3600 val_sm512 python tools/validate_synthetic.py --steps 2000 \
    --levels 4 --features 8 --steady_march 512 --out "$OUT/val_sm512"
runT 3600 val_l4f8 python tools/validate_synthetic.py --steps 2000 \
    --levels 4 --features 8 --out "$OUT/val_l4f8"

# --- trace the winner for next-session targeting -----------------------
runT 2400 trace_l4f8_sm python tools/profile_trace.py \
    --cfg '{"target_sample_batch_size": 1048576, "hash_n_levels": 4, "hash_n_features": 8, "steady_march_steps": 512}' \
    --out "$OUT/trace_l4f8_sm" --top 60
echo "=== session6d done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
