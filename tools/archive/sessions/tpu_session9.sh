#!/bin/bash
# Session-9: (a) classify the session-8 Mosaic remote-compile failure —
# round-1 Pallas kernels regression (check_pallas_tpu) + the dma_gather
# feature bisect (tools/bisect_pallas.py); (b) rerun the cut-off
# fine_table_rows texture arm; (c) the L8F8 structural arm: same row count
# as L8F4 but 64-lane cell rows (the dma probe measured XLA take at W=64
# 2.1x faster per row than W=32) and 2x capacity — if it benches near L4F8
# and holds the texture gate, it becomes the honest default.
set -u
OUT=${1:-/tmp/r2s9}
PREV=${2:-/tmp/r2s7}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
if [ -f "$PREV/runner.pid" ]; then
  while kill -0 "$(cat "$PREV/runner.pid")" 2>/dev/null; do sleep 30; done
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

echo "=== session9 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

# (a) Mosaic infra + kernel bisect
runT 1200 check_pallas python tools/check_pallas_tpu.py
runT 1800 bisect_pallas python tools/bisect_pallas.py

# (c) L8F8 structural arm: bench + texture gate (equal 2k-step protocol;
#     compare against /tmp/r2s6 texture_brick_2k 26.08 train / 19.15 eval
#     and texture_gather_2k 27.42 / 19.34)
runT 2400 bench_cellsm_l8f8_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "hash_n_features": 8, "row_layout": "cell", "steady_march_steps": 512}' \
    python bench.py
runT 2400 texture_l8f8_2k python tools/validate_synthetic.py \
    --steps 2000 --scene texture --levels 8 --features 8 --impl brick \
    --out "$OUT/texture_l8f8_2k"

# (b) fine_table_rows mitigation texture arm (cut off in session 6f)
runT 2400 texture_ftr_2k python tools/validate_synthetic.py \
    --steps 2000 --scene texture --levels 8 --features 4 --impl brick \
    --fine_table_rows 65536 --out "$OUT/texture_ftr_2k"

# L8F8 with bigger fine tables (capacity x2 rows): the speed cost of rows is
# per-row not per-byte, so if ftr helps quality it may ride free at F=8 too
runT 2400 texture_l8f8_ftr_2k python tools/validate_synthetic.py \
    --steps 2000 --scene texture --levels 8 --features 8 --impl brick \
    --fine_table_rows 65536 --out "$OUT/texture_l8f8_ftr_2k"

echo "=== session9 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
