#!/bin/bash
# Session-16 (fresh container; the queued s14/s15 runs were lost with /tmp):
# consolidated re-queue in decision-value order.
#   1. bench_rayfold_1m  — the unmeasured compact_impl=rayfold lever
#      (commit 8dd23ab): replaces the 8.7M-row sel build (~40 ms in
#      trace_default) with R+budget-row ops. If it wins, promote.
#   2. confirm_bench     — promoted defaults on the new code
#      (_axis_sum_matmul + cell_rows_cap landed after the 2.960M confirm).
#   3. val_default_2k    — quality canary (matmul-reduce changes f32 order).
#   4. bisect3           — DMA-envelope completion (k11 bitcast, k12-k14
#      grid scaling): gates the round-3 fused encoder design.
#   5. dma_probe_16k     — per-row DMA throughput inside the envelope
#      (f32 x 128 lanes): the decisive ns/row number vs XLA's 2.4 ns/row.
#   6. bench_cell_cap262k — is 442k-row fine cell scatter already degraded?
#   7. trace_rayfold     — attribution trace at the (presumed) new default.
set -u
OUT=${1:-/tmp/r2s16}
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

echo "=== session16 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

runT 2400 bench_rayfold_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "cell", "steady_march_steps": 512, "compact_impl": "rayfold"}' \
    python bench.py

runT 2400 confirm_bench python bench.py

runT 2400 val_default_2k python tools/validate_synthetic.py \
    --steps 2000 --scene ball --levels 8 --features 4 \
    --row_layout cell --steady_march 512 --out "$OUT/val_default_2k"

runT 3600 bisect3 python tools/bisect_pallas.py

runT 1800 dma_probe_16k python tools/profile_dma_gather.py \
    --rows 16384 --n 1048576 --widths 128 --dtype float32 \
    --tiles 2048,1024 --depths 4,8,16

runT 2400 bench_cell_cap262k env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "cell", "steady_march_steps": 512, "cell_rows_cap": 262144}' \
    python bench.py

runT 2400 trace_rayfold python tools/profile_trace.py \
    --cfg '{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "cell", "steady_march_steps": 512, "compact_impl": "rayfold"}' \
    --out "$OUT/trace_rayfold" --top 60

echo "=== session16 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
