#!/bin/bash
# Session-8: the row-access-wall probe. Decides the round-3 fused-encoder
# plan: if depth-pipelined per-row DMAs (ops/pallas_gather.py) beat XLA's
# gather wall (~2 ns/row marginal, ~300-430 M rows/s standalone) at cell-row
# shapes, the fused gather+interp+MLP kernel inherits its inner loop; if
# not, row-count reduction stays the only encoder lever.
set -u
OUT=${1:-/tmp/r2s8}
PREV=${2:-/tmp/r2s7}
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

echo "=== session8 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

# 1) DMA gather vs XLA take at cell-row widths. W=32/64 are the true
#    L8F4/L4F8 cell-row widths (sub-128-lane rows may fail Mosaic lowering
#    — that failure is itself a result); 128/256 bound the padded forms.
runT 2400 dma_gather python tools/profile_dma_gather.py \
    --rows 442368 --n 1048576 --widths 32,64,128,256 \
    --depths 4,8,16,32 --tiles 256,512,1024

# 2) lane-padding tax at cellfused shapes: elementwise / gather / scatter
#    at [5N,32] vs width-packed forms (PERF_PLAN padding hypothesis)
runT 2400 lanewidth python tools/profile_lanewidth.py --n 1048576 --levels 5

echo "=== session8 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
