#!/bin/bash
# Round-4 session 28 — first chip queue of the round.
#   1. ttq_prop_4k_v2 — the CLEAN proposal-path time-to-quality run
#      (VERDICT r3 next #2): skip-nonfinite optimizer landed in r3
#      (commit 3c03ed0) but the post-fix TTQ ladder never ran. Occ-path
#      numbers of record: 30 dB @ 148.6 s (results/r3s25/ttq_occ_4k_v2).
#   2. ttq_prop_tex_2k — prop on the adversarial texture scene (the
#      VERDICT asks for the ladder on more than one scene).
set -u
OUT=${1:-/root/repo/results/r4s28}
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

echo "=== session28 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

runT 3600 ttq_prop_4k_v2 python tools/validate_prop.py \
    --steps 4000 --rays 8192 --scene ball \
    --ttq_db 24,28,30,32 --out "$OUT/ttq_prop_4k_v2"

runT 2400 ttq_prop_tex_2k python tools/validate_prop.py \
    --steps 2000 --rays 8192 --scene texture \
    --ttq_db 20,24,26 --out "$OUT/ttq_prop_tex_2k"

echo "=== session28 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
