#!/bin/bash
# Round-4 session 30 (chains after s29) — prop-path divergence diagnosis
#   1. prop_diag_2k  — NaN-source telemetry through the ~1.28k divergence
#   2. prop_clip_ttq — grad-clip candidate fix + clean TTQ ladder
#   3. prop_clamp_ttq — density-clamp candidate fix + clean TTQ ladder
set -u
OUT=${1:-/root/repo/results/r4s30}
PREV=${2:-/root/repo/results/r4s29}
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

echo "=== session30 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

runT 2400 prop_diag_2k python tools/validate_prop.py \
    --steps 2000 --rays 8192 --scene ball --debug \
    --out "$OUT/prop_diag_2k"

runT 3600 prop_clip_ttq python tools/validate_prop.py \
    --steps 4000 --rays 8192 --scene ball --grad_clip 1.0 \
    --ttq_db 24,28,30,32 --out "$OUT/prop_clip_ttq"

runT 3600 prop_clamp_ttq python tools/validate_prop.py \
    --steps 4000 --rays 8192 --scene ball --density_clamp 20 \
    --ttq_db 24,28,30,32 --out "$OUT/prop_clamp_ttq"

echo "=== session30 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
