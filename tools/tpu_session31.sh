#!/bin/bash
# Round-4 session 31 v2 (chains after s32) — quality gates + banked TTQ
#   1. prop_ttq_warm   — the CLEAN prop TTQ of record: density_clamp=20
#                        default (fix validated r4s30), warm compile cache
#                        from the clamp arm (same program)
#   2. texture_def_4k / texture_ref_4k — long-horizon texture gate
#      (VERDICT #6). 20k-step gather is infeasible (2.2 s/step = 12 h);
#      4k steps = 2x the longest recorded ladder, tests gap growth.
#   3. val_triplane_v2 — retry at half budget (16.1G OOM at 262k budget)
#   4. mono pair at 2k — cuttable tail
set -u
OUT=${1:-/root/repo/results/r4s31}
PREV=${2:-/root/repo/results/r4s32}
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

echo "=== session31v2 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

runT 3600 prop_ttq_warm python tools/validate_prop.py \
    --steps 4000 --rays 8192 --scene ball \
    --ttq_db 24,28,30,32 --out "$OUT/prop_ttq_warm"

runT 3600 texture_def_4k python tools/validate_synthetic.py \
    --steps 4000 --scene texture --levels 8 --features 4 \
    --row_layout cell --fine_table_rows 65536 \
    --out "$OUT/texture_def_4k"

runT 11000 texture_ref_4k python tools/validate_synthetic.py \
    --steps 4000 --scene texture --levels 16 --features 2 \
    --impl gather --log2 21 \
    --out "$OUT/texture_ref_4k"

runT 2400 val_triplane_v2 python tools/validate_synthetic.py \
    --steps 2000 --scene ball --grid_type triplane --budget 131072 \
    --out "$OUT/val_triplane_v2"

runT 3600 mono_def_2k python tools/validate_synthetic.py \
    --steps 2000 --scene mono --levels 8 --features 4 \
    --row_layout cell --fine_table_rows 65536 \
    --out "$OUT/mono_def_2k"

runT 7200 mono_ref_2k python tools/validate_synthetic.py \
    --steps 2000 --scene mono --levels 16 --features 2 \
    --impl gather --log2 21 \
    --out "$OUT/mono_ref_2k"

echo "=== session31v2 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
