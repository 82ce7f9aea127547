#!/bin/bash
# Round-3 session 21 (chains after s20): post-refutation tail-shaving data.
#   1. trace_promoted — fresh per-op trace AT the promoted defaults
#      (cell + sm512 + rayfold, 1M): the s6 attribution predates all three
#      landed levers; this decides where the next 50-100 ms lives.
#   2. confirm_bench  — plain bench.py (bench_defaults.json): r3 code drift
#      check + the warm-cache warmup-time measurement (VERDICT item 7:
#      a warm re-bench should show persistent-cache hits and <60 s compile).
set -u
OUT=${1:-/root/repo/results/r3s21}
PREV=${2:-/root/repo/results/r3s20}
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

echo "=== session21 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

runT 2400 trace_promoted python tools/profile_trace.py \
    --out "$OUT/trace" --top 48 \
    --cfg '{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "cell", "steady_march_steps": 512, "compact_impl": "rayfold"}'

runT 2400 confirm_bench python bench.py

echo "=== session21 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
