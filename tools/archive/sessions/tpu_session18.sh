#!/bin/bash
# Session-18 (chains after s16): the round-3 fused-encoder decision gates
# FIRST (they unblock the biggest remaining lever), then the preempted
# quality/ttq arms from the lost s15.
#   1. bisect4        — full ladder incl. k15/k16 (the fused kernel's
#                       structural features on the remote Mosaic build)
#   2. fused_enc_1m   — profile_fused_enc.py: fused DMA+interp kernel vs
#                       XLA gather floor at bench shapes. DECISION: if
#                       fused < xla_gather, wire interp_impl=dma arm.
#   3. bench_dma_1m   — end-to-end bench with interp_impl=dma (brick
#                       row_layout; only meaningful if 1-2 pass)
#   4+ quality arms   — ttq occ vs prop, monocular gate, dma probe 65k
set -u
OUT=${1:-/tmp/r2s18}
PREV=${2:-/tmp/r2s16}
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

echo "=== session18 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

runT 3600 bisect4 python tools/bisect_pallas.py --rung_timeout 300

runT 2400 fused_enc_1m python tools/profile_fused_enc.py \
    --n 1048576 --tiles 512,1024,2048 --depths 8,16

runT 2400 bench_dma_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "brick", "steady_march_steps": 512, "compact_impl": "rayfold", "interp_impl": "dma", "scatter_impl": "fused", "remat_feats": true}' \
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

runT 1800 dma_probe_65k python tools/profile_dma_gather.py \
    --rows 65536 --n 1048576 --widths 128 --dtype float32 \
    --tiles 2048 --depths 4,8,16

echo "=== session18 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
