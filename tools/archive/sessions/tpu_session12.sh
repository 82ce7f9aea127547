#!/bin/bash
# Session-12: consolidated recovery of the session-9/10/11 queues (the VM
# restarted before they ran; /tmp was wiped). Priorities:
#   1. confirm the promoted default bench (L8F4 + cell + sm512, 2.946M)
#   2. cellz arm — the new z-packed 96-lane cell layout (commit 8eb5da7):
#      3x fewer gather/scatter rows than cell at 3x the lane width, which
#      the session-8 lane probe priced at ~2.1x cheaper per row (W>=64).
#   3. L8F8 structural arm (64-lane cell rows, 2x capacity)
#   4. texture quality gates: L8F8, fine_table_rows=65536, L8F8+ftr
#   5. Mosaic classification: check_pallas regression + dma_gather bisect
#   6. DMA-gather probes at cell/brick row shapes (only useful if 5 passes)
#   7. trace of the promoted default + scatter-vs-table-rows curve
set -u
OUT=${1:-/tmp/r2s12}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
echo $$ > "$OUT/runner.pid"
runT() {
  local tmo=$1 name=$2; shift 2
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1 &
  echo $! > "$OUT/child.pid"
  wait $!
  echo "=== $name rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
}

echo "=== session12 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

# 1. promoted-default confirmation (bench_defaults.json drives the cfg)
runT 2400 confirm_bench python bench.py

# 2. cellz arm at the promoted knobs
runT 2400 bench_cellz_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "cellz", "steady_march_steps": 512}' \
    python bench.py

# 3. L8F8 structural arm
runT 2400 bench_cell_l8f8_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "hash_n_features": 8, "row_layout": "cell", "steady_march_steps": 512}' \
    python bench.py

# 3b. cellz at F=8 (32-lane z-rows -> 192 lanes... only if F=8 wins above;
#     cheap to measure regardless)
runT 2400 bench_cellz_l8f8_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "hash_n_features": 8, "row_layout": "cellz", "steady_march_steps": 512}' \
    python bench.py

# 4. texture gates (equal 2k-step protocol; compare texture_brick_2k
#    26.08 train / 19.15 eval and texture_gather_2k 27.42 / 19.34)
runT 2400 texture_l8f8_2k python tools/validate_synthetic.py \
    --steps 2000 --scene texture --levels 8 --features 8 --impl brick \
    --out "$OUT/texture_l8f8_2k"
runT 2400 texture_ftr_2k python tools/validate_synthetic.py \
    --steps 2000 --scene texture --levels 8 --features 4 --impl brick \
    --fine_table_rows 65536 --out "$OUT/texture_ftr_2k"
runT 2400 texture_l8f8_ftr_2k python tools/validate_synthetic.py \
    --steps 2000 --scene texture --levels 8 --features 8 --impl brick \
    --fine_table_rows 65536 --out "$OUT/texture_l8f8_ftr_2k"

# 5. Mosaic classification
runT 1200 check_pallas python tools/check_pallas_tpu.py
runT 1800 bisect_pallas python tools/bisect_pallas.py

# 6. DMA-gather probes (cell rows then brick rows)
runT 3000 dma_gather_cell python tools/profile_dma_gather.py \
    --rows 442368 --n 1048576 --widths 32,64,128 \
    --depths 4,8,16 --tiles 256,512,1024
runT 2400 dma_gather_brick python tools/profile_dma_gather.py \
    --rows 16384 --n 1048576 --widths 256 \
    --depths 4,8,16 --tiles 256,512,1024

# 7. attribution of the promoted default + the scatter-rows curve
runT 2400 trace_default python tools/profile_trace.py \
    --cfg '{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "cell", "steady_march_steps": 512}' \
    --out "$OUT/trace_default" --top 60
runT 3000 scatter_rows python tools/profile_scatter_rows.py

echo "=== session12 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
