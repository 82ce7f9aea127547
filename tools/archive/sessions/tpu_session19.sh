#!/bin/bash
# Round-3 session 19: the fused-DMA encoder decision gates FIRST
# (VERDICT r2 item 1 — the round's highest-leverage lever), then the
# speed/quality-default unifier, then the twice-lost TTQ + quality arms.
#
# Results write-through to the repo (results/ is gitignored but survives
# container death, unlike /tmp — VERDICT r2 item 7 / weak #5).
#
#   1. bisect_fused  — k15/k16 fwd rungs + k17 bwd on the remote Mosaic
#                      build (structural compile gates for interp_impl=dma)
#   2. fused_enc_1m  — fused DMA+interp kernel vs the XLA gather floor at
#                      bench shapes. DECISION: fused < xla ⇒ dma arm is live
#   3. bench_dma_1m  — end-to-end bench, interp_impl=dma (brick layout;
#                      bwd tile now auto-scales to the 2048-program bound)
#   4. bench_cell_ftr_1m — VERDICT item 4: the quality-gated ftr65536 knob
#                      at the promoted cell bench defaults (cell_rows_cap
#                      falls fine levels back to brick past the knee)
#   5. ttq_occ_4k / ttq_prop_4k — first recorded time-to-quality numbers
#   6. val_mono_2k   — monocular-orbit (vrig-regime) quality gate
#   7. eval_800      — eval/viewer ms/frame vs the reference GUI contract
set -u
OUT=${1:-/root/repo/results/r3s19}
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

echo "=== session19 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

runT 1500 bisect_fused python tools/bisect_pallas.py --rung_timeout 300 \
    --only k15_fusedtoy,k16_fusedbench,k17_fusedbwd

runT 2400 fused_enc_1m python tools/profile_fused_enc.py \
    --n 1048576 --tiles 512,1024,2048 --depths 8,16

runT 2400 bench_dma_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "brick", "steady_march_steps": 512, "compact_impl": "rayfold", "interp_impl": "dma", "scatter_impl": "fused", "remat_feats": true}' \
    python bench.py

runT 2400 bench_cell_ftr_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "cell", "steady_march_steps": 512, "compact_impl": "rayfold", "fine_table_rows": 65536}' \
    python bench.py

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

echo "=== session19 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
