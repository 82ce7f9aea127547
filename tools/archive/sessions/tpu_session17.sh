#!/bin/bash
# Session-17: the quality / time-to-quality arms preempted since s13
# (re-queued from the lost s15), chained after the s16 perf queue.
#   * ttq_occ vs ttq_prop: time-to-PSNR on the occupancy path vs the
#     proposal (PDF-resampling) path — PERF_PLAN round-3 item 4: the
#     proposal sampler places ~3x fewer samples/ray at equal PSNR, so
#     time-to-quality is the honest cross-sampler metric.
#   * val_mono: monocular-orbit (vrig-regime) quality gate.
#   * dma_probe_65k: the ftr65536-shaped DMA throughput point.
set -u
OUT=${1:-/tmp/r2s17}
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

echo "=== session17 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

runT 3600 ttq_occ_4k python tools/validate_synthetic.py \
    --steps 4000 --scene ball --levels 8 --features 4 \
    --row_layout cell --steady_march 512 --budget 1048576 \
    --ttq_db 24,28,30,32 --out "$OUT/ttq_occ_4k"

runT 3600 ttq_prop_4k python tools/validate_prop.py \
    --steps 4000 --rays 8192 --scene ball \
    --ttq_db 24,28,30,32 --out "$OUT/ttq_prop_4k"

runT 3600 ttq_prop_4k_16k python tools/validate_prop.py \
    --steps 4000 --rays 16384 --scene ball \
    --ttq_db 24,28,30,32 --out "$OUT/ttq_prop_4k_16k"

runT 3600 val_mono_2k python tools/validate_synthetic.py \
    --steps 2000 --scene mono --levels 8 --features 4 \
    --ttq_db 24,28,30 --out "$OUT/val_mono_2k"

runT 1800 dma_probe_65k python tools/profile_dma_gather.py \
    --rows 65536 --n 1048576 --widths 128 --dtype float32 \
    --tiles 2048 --depths 4,8,16

echo "=== session17 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
