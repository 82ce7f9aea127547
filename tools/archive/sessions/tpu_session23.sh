#!/bin/bash
# Round-3 session 23 (chains after s22): retries + repaired-config gates.
#   1. ttq_occ_4k_v2     — UNCONTENDED re-run (the s20 ttq_occ arm shared
#                          the 1-CPU host with pytest for ~10 min; its
#                          wall-clock numbers are inflated vs ttq_prop)
#   2. texture_cell_ftr_v2 — the L8F4+cell+ftr unify candidate WITH the
#                          steady-march auto-repair active (the s20 run
#                          measured the span-truncation bug, not the config)
#   3. bench_cell_ftr_1m — retry of the s20 arm that hit the intermittent
#                          remote-compile wedge at its steady program
set -u
OUT=${1:-/root/repo/results/r3s23}
PREV=${2:-/root/repo/results/r3s22}
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

echo "=== session23 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

runT 3600 ttq_occ_4k_v2 python tools/validate_synthetic.py \
    --steps 4000 --scene ball --levels 8 --features 4 \
    --row_layout cell --steady_march 512 --budget 1048576 \
    --ttq_db 24,28,30,32 --out "$OUT/ttq_occ_4k_v2"

runT 2400 texture_cell_ftr_v2 python tools/validate_synthetic.py \
    --steps 2000 --scene texture --levels 8 --features 4 \
    --row_layout cell --steady_march 512 --fine_table_rows 65536 \
    --out "$OUT/texture_cell_ftr_v2"

runT 2400 bench_cell_ftr_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "cell", "steady_march_steps": 512, "compact_impl": "rayfold", "fine_table_rows": 65536}' \
    python bench.py

echo "=== session23 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
