#!/bin/bash
# Round-4 session 33 (chains after s31) — prop late-horizon stabilizers.
# r4s30 prop_clamp_ttq: finite through 4k steps, TTQ 30 dB @ step 112,
# but NOVEL-VIEW eval collapsed (10.85 dB): the density runaway persists
# below the clamp and degenerates geometry by ~4k steps.
#   1. prop_1500       — pre-blowup eval trajectory point
#   2. prop_clip4k     — clamp(default) + grad_clip 1.0
#   3. prop_anneal4k   — clamp(default) + anneal 4000 (slower resample
#                        concentration)
set -u
OUT=${1:-/root/repo/results/r4s33}
PREV=${2:-/root/repo/results/r4s31}
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

echo "=== session33 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

runT 1800 prop_1500 python tools/validate_prop.py \
    --steps 1500 --rays 8192 --scene ball \
    --ttq_db 24,28,30 --out "$OUT/prop_1500"

runT 3600 prop_clip4k python tools/validate_prop.py \
    --steps 4000 --rays 8192 --scene ball --grad_clip 1.0 \
    --ttq_db 24,28,30,32 --out "$OUT/prop_clip4k"

runT 3600 prop_anneal4k python tools/validate_prop.py \
    --steps 4000 --rays 8192 --scene ball --anneal_steps 4000 \
    --ttq_db 24,28,30,32 --out "$OUT/prop_anneal4k"

echo "=== session33 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
