#!/bin/bash
# Round-3 session 22 (chains after s21): the L4F8 + fine-tables candidate.
# L4F8 halves rows/sample (the 9.4 ns/row wall is THE step cost: measured
# +55% bench in s6e) but failed the texture gate by -1.08 dB on fine-level
# capacity — exactly what fine_table_rows fixes for L8F4 (-1.34 -> -0.16).
# fine_from_level=2 targets the two hashed levels of the L4 split.
#   1. texture_l4f8_ftr — the quality gate (2k-step protocol, compare:
#      ref-exact 27.42 train / L8F4+ftr 27.26)
#   2. bench_l4f8_ftr   — the speed half at the same exact config
#   3. val_l4f8_ftr     — ball-scene eval PSNR sanity (novel view)
set -u
OUT=${1:-/root/repo/results/r3s22}
PREV=${2:-/root/repo/results/r3s21}
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

echo "=== session22 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

runT 2400 texture_l4f8_ftr python tools/validate_synthetic.py \
    --steps 2000 --scene texture --levels 4 --features 8 \
    --row_layout cell --steady_march 512 \
    --fine_table_rows 65536 --fine_from_level 2 \
    --out "$OUT/texture_l4f8_ftr"

runT 2400 bench_l4f8_ftr env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "cell", "steady_march_steps": 512, "compact_impl": "rayfold", "hash_n_levels": 4, "hash_n_features": 8, "fine_table_rows": 65536, "fine_from_level": 2}' \
    python bench.py

runT 2400 val_l4f8_ftr python tools/validate_synthetic.py \
    --steps 2000 --scene ball --levels 4 --features 8 \
    --row_layout cell --steady_march 512 \
    --fine_table_rows 65536 --fine_from_level 2 \
    --out "$OUT/val_l4f8_ftr"

echo "=== session22 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
