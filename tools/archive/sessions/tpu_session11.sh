#!/bin/bash
# Session-11: the decisive round-3 microbench — pipelined per-row DMA gather
# vs XLA take at CELL-ROW shapes (W=32 is the shipped L8F4 cell row; the
# session-8 run died in the tunnel's remote Mosaic compile, and session-9's
# bisect ladder now passes every rung, so the kernel itself compiles).
# If DMA beats the ~100 M rows/s W=32 take wall by >=2x, the fused
# gather+interp(+MLP) encoder kernel is worth building; if not, row-count
# reduction (z-packed cell rows, run dedup) stays the only encoder lever.
set -u
OUT=${1:-/tmp/r2s11}
PREV=${2:-/tmp/r2s10}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
if [ -f "$PREV/runner.pid" ]; then
  while kill -0 "$(cat "$PREV/runner.pid")" 2>/dev/null; do sleep 30; done
fi
echo $$ > "$OUT/runner.pid"
runT() {
  local tmo=$1 name=$2; shift 2
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1 &
  echo $! > "$OUT/child.pid"
  wait $!
  echo "=== $name rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
}

echo "=== session11 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

# Cell-row shapes first (the shipped default): 442k-row L8F4 fine cell table.
runT 3000 dma_gather_cell python tools/profile_dma_gather.py \
    --rows 442368 --n 1048576 --widths 32,64,128 \
    --depths 4,8,16 --tiles 256,512,1024

# Brick-row shapes (the fused-megakernel operand: [16384, 256]).
runT 2400 dma_gather_brick python tools/profile_dma_gather.py \
    --rows 16384 --n 1048576 --widths 256 \
    --depths 4,8,16 --tiles 256,512,1024

echo "=== session11 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
