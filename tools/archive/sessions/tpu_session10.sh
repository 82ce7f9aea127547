#!/bin/bash
# Session-10: (a) trace the PROMOTED default (L8F4 + cell + sm512) — every
# prior trace was of a different arm, and the next lever must come from this
# attribution; (b) confirm the unattended bench_defaults.json path; (c) map
# the scatter-rate-vs-table-rows curve (the cellfused lesson: scatter
# degrades ~40x somewhere between 442k and 2.2M destination rows — locate
# the knee, and measure whether ray-run index patterns beat random).
set -u
OUT=${1:-/tmp/r2s10}
PREV=${2:-/tmp/r2s9}
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

echo "=== session10 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

runT 2400 confirm_bench python bench.py

runT 2400 trace_default python tools/profile_trace.py \
    --cfg '{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "cell", "steady_march_steps": 512}' \
    --out "$OUT/trace_default" --top 60

runT 3000 scatter_rows python tools/profile_scatter_rows.py

echo "=== session10 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
