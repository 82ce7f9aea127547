#!/bin/bash
# Round-3 session 25 (consolidates the stopped s23/s24; chains after s22).
# Priority order — later arms may be cut by round end:
#   1. ttq_occ_4k_v2      — UNCONTENDED time-to-quality (the s20 run shared
#                           the 1-CPU host with pytest)
#   2. texture_l4f8_ftr131k — can 131072-row fine tables close the 3.81M
#                           config's remaining -0.53 dB texture gap?
#   3. ttq_bench_30db     — bench.py --metric time_to_30db (first recorded
#                           run of the seconds-to-quality bench metric)
#   4. eval_800_packed    — eval ms/frame after the packed-lattice rewrite
#   5. eval_800_chunk16k  — + 16384-ray chunks
#   6. texture_cell_ftr_v2 — the L8F4 unify candidate WITH auto-repair
#   7. bench_l4f8_ftr131k — speed of the 131k quality candidate
#   8. bench_cell_ftr_1m  — retry of the wedged s20 arm
set -u
OUT=${1:-/root/repo/results/r3s25}
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

echo "=== session25 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

runT 3600 ttq_occ_4k_v2 python tools/validate_synthetic.py \
    --steps 4000 --scene ball --levels 8 --features 4 \
    --row_layout cell --steady_march 512 --budget 1048576 \
    --ttq_db 24,28,30,32 --out "$OUT/ttq_occ_4k_v2"

runT 2400 texture_l4f8_ftr131k python tools/validate_synthetic.py \
    --steps 2000 --scene texture --levels 4 --features 8 \
    --row_layout cell --steady_march 512 \
    --fine_table_rows 131072 --fine_from_level 2 \
    --out "$OUT/texture_l4f8_ftr131k"

runT 1800 ttq_bench_30db python bench.py --metric time_to_30db

runT 1800 eval_800_packed python tools/profile_eval.py --wh 800

runT 1800 eval_800_chunk16k python tools/profile_eval.py --wh 800 --chunk 16384

runT 2400 texture_cell_ftr_v2 python tools/validate_synthetic.py \
    --steps 2000 --scene texture --levels 8 --features 4 \
    --row_layout cell --steady_march 512 --fine_table_rows 65536 \
    --out "$OUT/texture_cell_ftr_v2"

runT 2400 bench_l4f8_ftr131k env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "cell", "steady_march_steps": 512, "compact_impl": "rayfold", "hash_n_levels": 4, "hash_n_features": 8, "fine_table_rows": 131072, "fine_from_level": 2}' \
    python bench.py

runT 2400 bench_cell_ftr_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "cell", "steady_march_steps": 512, "compact_impl": "rayfold", "fine_table_rows": 65536}' \
    python bench.py

echo "=== session25 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
