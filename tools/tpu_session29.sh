#!/bin/bash
# Round-4 session 29 (chains after s28) — eval-v2 measurement + r4 bench
#   1. eval2_seg_800     — the NEW segment-compacted eval path at 800x800
#                          (VERDICT r3 next #1; old path: 17-38 s/frame)
#   2. eval2_lat_800     — lattice-path A/B at the SAME warm state
#   3. trace_r4          — fresh step trace at the promoted defaults WITH
#                          shrink-from-full steady-march (tail attribution
#                          for the >=3.5M push)
#   4. bench_r4_preview  — dual-metric bench (samples/s + time_to_30db;
#                          VERDICT next #3) with the auto-shrink lattice
#   5/6. val_hash4d/val_triplane — quality arms for the alternative
#                          encoders (VERDICT next #8)
set -u
OUT=${1:-/root/repo/results/r4s29}
PREV=${2:-/root/repo/results/r4s28}
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

echo "=== session29 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

runT 3600 eval2_seg_800 python tools/profile_eval2.py \
    --wh 800 --warm_steps 1000 --impl seg

runT 3600 eval2_lat_800 python tools/profile_eval2.py \
    --wh 800 --warm_steps 1000 --impl lattice --chunk 16384 \
    --ladder 256:64,64:32,16:8

runT 2400 trace_r4 python tools/profile_trace.py \
    --out "$OUT/trace" --top 48 \
    --cfg '{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "cell", "compact_impl": "rayfold", "fine_table_rows": 65536}'

runT 3600 bench_r4_preview python bench.py

runT 2400 val_hash4d python tools/validate_synthetic.py \
    --steps 2000 --scene ball --levels 8 --features 4 \
    --grid_type hash4d --out "$OUT/val_hash4d"

runT 2400 val_triplane python tools/validate_synthetic.py \
    --steps 2000 --scene ball --grid_type triplane \
    --out "$OUT/val_triplane"

echo "=== session29 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
