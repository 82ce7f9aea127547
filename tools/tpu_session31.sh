#!/bin/bash
# Round-4 session 31 (chains after s30) — long-horizon texture gate
# (VERDICT r3 next #6). The literal 20k-step reference-exact arm is
# infeasible on this chip: the per-corner gather encoder measures
# ~2.2 s/step (PERF_PLAN s12) -> 12 h for 20k steps. The affordable
# honest version: a 4k-step equal-protocol A/B (2x the longest recorded
# ladder point) testing whether the unified default's -0.16 dB gap GROWS
# with steps (the old capped default's did: 0.0@256 -> 0.98@1280).
#   1. texture_def_4k — unified default (L8F4 cell rayfold ftr65536)
#   2. texture_ref_4k — reference-exact gather L16F2@2^21 (slow arm)
#   3. mono_def_2k / mono_ref_2k — monocular pair at 2k (gather mono at
#      4k would not fit the round)
set -u
OUT=${1:-/root/repo/results/r4s31}
PREV=${2:-/root/repo/results/r4s30}
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

echo "=== session31 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

runT 3600 texture_def_4k python tools/validate_synthetic.py \
    --steps 4000 --scene texture --levels 8 --features 4 \
    --row_layout cell --fine_table_rows 65536 \
    --out "$OUT/texture_def_4k"

runT 11000 texture_ref_4k python tools/validate_synthetic.py \
    --steps 4000 --scene texture --levels 16 --features 2 \
    --impl gather --log2 21 \
    --out "$OUT/texture_ref_4k"

runT 3600 mono_def_2k python tools/validate_synthetic.py \
    --steps 2000 --scene mono --levels 8 --features 4 \
    --row_layout cell --fine_table_rows 65536 \
    --out "$OUT/mono_def_2k"

runT 7200 mono_ref_2k python tools/validate_synthetic.py \
    --steps 2000 --scene mono --levels 16 --features 2 \
    --impl gather --log2 21 \
    --out "$OUT/mono_ref_2k"

echo "=== session31 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
