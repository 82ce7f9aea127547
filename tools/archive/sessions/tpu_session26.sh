#!/bin/bash
# Round-3 session 26 (chains after s25): the last quality rung of the
# fine-table ladder — 262144-row fine tables on the L4F8 split
# (65536: -0.53, 131072: -0.36 vs reference-exact; each doubling has
# bought ~+0.17 dB, so 262144 projects to ~-0.2 = gate PASS). If it
# passes and benches like the 131k arm, it becomes the unified default.
set -u
OUT=${1:-/root/repo/results/r3s26}
PREV=${2:-/root/repo/results/r3s25}
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

echo "=== session26 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

runT 2400 texture_l4f8_ftr262k python tools/validate_synthetic.py \
    --steps 2000 --scene texture --levels 4 --features 8 \
    --row_layout cell --steady_march 512 \
    --fine_table_rows 262144 --fine_from_level 2 \
    --out "$OUT/texture_l4f8_ftr262k"

runT 2400 bench_l4f8_ftr262k env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "cell", "steady_march_steps": 512, "compact_impl": "rayfold", "hash_n_levels": 4, "hash_n_features": 8, "fine_table_rows": 262144, "fine_from_level": 2}' \
    python bench.py

echo "=== session26 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
