#!/bin/bash
# Round-3 session 27 (chains after s26): the FINAL unified-default bench.
# Config = the promotion candidate: L8F4 + cell + rayfold + cumsum +
# ftr65536, steady skip OFF (the skip's +8% was hidden truncation; the
# quality gate is held via bit-parity with the measured brick+ftr arm,
# -0.16 dB vs reference-exact). This number becomes bench_defaults.json.
set -u
OUT=${1:-/root/repo/results/r3s27}
PREV=${2:-/root/repo/results/r3s26}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
echo $$ > "$OUT/runner.pid"

if [ -f "$PREV/runner.pid" ]; then
  prev=$(cat "$PREV/runner.pid")
  while kill -0 "$prev" 2>/dev/null; do sleep 30; done
fi

runT() {
  local tmo=$1 name=$2; shift 2
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1 &
  echo $! > "$OUT/child.pid"
  wait $!
  echo "=== $name rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
}

echo "=== session27 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

runT 2400 bench_default_final env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "cell", "steady_march_steps": 0, "compact_impl": "rayfold", "fine_table_rows": 65536}' \
    python bench.py

echo "=== session27 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
