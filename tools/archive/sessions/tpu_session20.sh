#!/bin/bash
# Round-3 session 20 (after the dma128 k15-k17 gates pass): decision
# profiles + end-to-end benches, then the quality/TTQ arms. Results under
# repo-local results/ (survives container death).
set -u
OUT=${1:-/root/repo/results/r3s20}
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

echo "=== session20 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

runT 2400 fused_enc_1m python tools/profile_fused_enc.py \
    --n 1048576 --tiles 512,1024,2048 --depths 8,16

runT 2400 bench_dma_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "brick", "steady_march_steps": 512, "compact_impl": "rayfold", "interp_impl": "dma", "remat_feats": true}' \
    python bench.py

runT 2400 bench_cell_ftr_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "cell", "steady_march_steps": 512, "compact_impl": "rayfold", "fine_table_rows": 65536}' \
    python bench.py

# VERDICT item 4 quality half: the unify candidate (cell + ftr65536, the
# exact bench_cell_ftr_1m config) on the adversarial texture scene, same
# 2k-step protocol as the session-12 gate table (compare: ref-exact 27.42,
# brick+ftr 27.26 train PSNR)
runT 2400 texture_cell_ftr python tools/validate_synthetic.py \
    --steps 2000 --scene texture --levels 8 --features 4 \
    --row_layout cell --steady_march 512 --fine_table_rows 65536 \
    --out "$OUT/texture_cell_ftr"

runT 3600 ttq_occ_4k python tools/validate_synthetic.py \
    --steps 4000 --scene ball --levels 8 --features 4 \
    --row_layout cell --steady_march 512 --budget 1048576 \
    --ttq_db 24,28,30,32 --out "$OUT/ttq_occ_4k"

runT 3600 ttq_prop_4k python tools/validate_prop.py \
    --steps 4000 --rays 8192 --scene ball \
    --ttq_db 24,28,30,32 --out "$OUT/ttq_prop_4k"

runT 3600 val_mono_2k python tools/validate_synthetic.py \
    --steps 2000 --scene mono --levels 8 --features 4 \
    --ttq_db 24,28,30 --out "$OUT/val_mono_2k"

runT 1800 eval_800 python tools/profile_eval.py --wh 800

echo "=== session20 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
