#!/bin/bash
# Session-15: (a) re-queue the s13 quality/ttq arms that were preempted so
# the decision-gating s14 measurements (bisect3 envelope, fresh trace,
# confirm bench) could run first; (b) the DMA-gather THROUGHPUT probe inside
# the compile envelope session-13's bisect mapped (f32 rows, 128 lanes,
# modest grids) — the decisive number for the round-3 fused-encoder kernel:
# XLA's take costs ~2.4 ns/row at 442k-row tables; per-row pipelined DMAs
# must land in that ballpark for a fused gather+interp+MLP kernel to be
# worth building.
set -u
OUT=${1:-/tmp/r2s15}
PREV=${2:-/tmp/r2s14}
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

echo "=== session15 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

# 0. DMA throughput probe at brick-table shapes, inside the envelope:
#    f32 x 128 lanes (the bitcast view of a bf16[*,256] brick row),
#    16384-row (default) and 65536-row (ftr) tables, 1M gathered rows.
#    tile=2048 keeps the grid at 512 programs (bisect k14's config).
runT 1800 dma_probe_16k python tools/profile_dma_gather.py \
    --rows 16384 --n 1048576 --widths 128 --dtype float32 \
    --tiles 2048,1024 --depths 4,8,16
runT 1800 dma_probe_65k python tools/profile_dma_gather.py \
    --rows 65536 --n 1048576 --widths 128 --dtype float32 \
    --tiles 2048 --depths 4,8,16

# 1. time-to-quality, occupancy path (bench defaults)
runT 3600 ttq_occ_4k python tools/validate_synthetic.py \
    --steps 4000 --scene ball --levels 8 --features 4 \
    --row_layout cell --steady_march 512 --budget 1048576 \
    --ttq_db 24,28,30,32 --out "$OUT/ttq_occ_4k"

# 2. time-to-quality, proposal path (dense shapes, no occupancy lattice)
runT 3600 ttq_prop_4k python tools/validate_prop.py \
    --steps 4000 --rays 8192 --scene ball \
    --ttq_db 24,28,30,32 --out "$OUT/ttq_prop_4k"

# 2b. prop ray-batch scaling
runT 3600 ttq_prop_4k_16k python tools/validate_prop.py \
    --steps 4000 --rays 16384 --scene ball \
    --ttq_db 24,28,30,32 --out "$OUT/ttq_prop_4k_16k"

# 3. monocular (vrig-regime) quality gate
runT 3600 val_mono_2k python tools/validate_synthetic.py \
    --steps 2000 --scene mono --levels 8 --features 4 \
    --ttq_db 24,28,30 --out "$OUT/val_mono_2k"

echo "=== session15 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
