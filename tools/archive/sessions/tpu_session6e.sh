#!/bin/bash
# Session-6e: cell-row-layout benches (row_layout=cell re-materializes
# hashed tables per-cell so per-sample encoder ops run at 8F lanes; see
# ops/brick_grid.py). Waits for session 6d's runner to exit first.
set -u
OUT=${1:-/tmp/r2s6}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
if [ -f "$OUT/runner.pid" ]; then
  while kill -0 "$(cat "$OUT/runner.pid")" 2>/dev/null; do sleep 30; done
fi
echo $$ > "$OUT/runner.pid"
runT() {
  local tmo=$1 name=$2; shift 2
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1 &
  echo $! > "$OUT/child.pid"
  wait $!
  echo "=== $name rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
}

echo "=== session6e takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

runT 2400 bench_cell_l4f8_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "hash_n_levels": 4, "hash_n_features": 8, "row_layout": "cell"}' \
    python bench.py
runT 2400 bench_cellsm_l4f8_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "hash_n_levels": 4, "hash_n_features": 8, "row_layout": "cell", "steady_march_steps": 512}' \
    python bench.py
# bf16-trajectory check for the cell layout (math-identical in f32;
# bf16 dot accumulates 8 vs 64 lanes)
runT 3600 val_cell python tools/validate_synthetic.py --steps 2000 \
    --levels 4 --features 8 --row_layout cell --out "$OUT/val_cell"
echo "=== session6e done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
