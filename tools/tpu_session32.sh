#!/bin/bash
# Round-4 session 32 (chains after s30) — eval re-measure with the
# cursor-window loop (adaptive N_samples policy + zero lattice-sized ops
# per pass; the s29 seg ladder was FLAT at 24-29 s because the greedy
# compaction consumed every segment of a ray in one pass and re-paid an
# [C, Ms]-lattice rayfold each pass).
#   1. eval3_cloud_800 — volumetric adversarial scene (41.5M useful
#      samples/frame: row-wall-bound; honesty row)
#   2. eval3_ball_800  — opaque surface-like scene (the reference-GUI
#      regime; the <= 1 s target applies here)
#   3. eval3_ball_400  — viewer-size frames
set -u
OUT=${1:-/root/repo/results/r4s32}
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

echo "=== session32 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

runT 3600 eval3_cloud_800 python tools/profile_eval2.py \
    --wh 800 --warm_steps 1000 --impl seg --scene cloud

runT 3600 eval3_ball_800 python tools/profile_eval2.py \
    --wh 800 --warm_steps 1000 --impl seg --scene ball

runT 1800 eval3_ball_400 python tools/profile_eval2.py \
    --wh 400 --warm_steps 1000 --impl seg --scene ball \
    --ladder 256:64,64:32,16:8

echo "=== session32 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
