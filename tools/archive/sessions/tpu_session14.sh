#!/bin/bash
# Session-14: measure the two CPU-side changes landed mid-session-13
# (code on disk is picked up by each queue item at launch, so the later
# s13 arms already ran with them; the PROMOTED-DEFAULT confirm for the
# new code lands here):
#   * _axis_sum_matmul — the 18 per-level 1-D-output position-grad lane
#     reductions (~59 ms/step in trace_default, 19% of the step) now run
#     as one [N,3W]x[3W,3] MXU contraction per level
#   * cell_rows_cap — per-level cell->brick fallback past the measured
#     big-table scatter knee (makes fine_table_rows=65536 cell-compatible)
set -u
OUT=${1:-/tmp/r2s14}
PREV=${2:-/tmp/r2s13}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
echo $$ > "$OUT/runner.pid"

if [ -f "$PREV/runner.pid" ]; then
  prev=$(cat "$PREV/runner.pid")
  while kill -0 "$prev" 2>/dev/null; do sleep 60; done
fi

runT() {
  local tmo=$1 name=$2; shift 2
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1 &
  echo $! > "$OUT/child.pid"
  wait $!
  echo "=== $name rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
}

echo "=== session14 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

# 0. DMA-envelope bisect (k11 bitcast / k12-k14 grid scaling)
runT 3600 bisect3 python tools/bisect_pallas.py

# 1. the promoted default on the new code (vs 2.960M on the old)
runT 2400 confirm_bench python bench.py

# 1b. cap=262144: the W=32 scatter curve jumps 9->98 ns/row between
#     262k and 1M table rows; if 442k-row fine cell tables already sit in
#     the degrading band, pushing JUST the fine levels back to brick
#     (16384-row W=256 scatters, ~10.8 ns/row) wins
runT 2400 bench_cell_cap262k env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "cell", "steady_march_steps": 512, "cell_rows_cap": 262144}' \
    python bench.py

# 2. attribution trace: the convert_reduce block (~59 ms) must be gone
runT 2400 trace_default2 python tools/profile_trace.py \
    --cfg '{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "cell", "steady_march_steps": 512}' \
    --out "$OUT/trace_default2" --top 60

# 3. quality re-gate at the new code (matmul-reduce changes f32 sum order;
#    the ball val is the cheap regression canary)
runT 2400 val_default_2k python tools/validate_synthetic.py \
    --steps 2000 --scene ball --levels 8 --features 4 \
    --row_layout cell --steady_march 512 --out "$OUT/val_default_2k"

echo "=== session14 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
