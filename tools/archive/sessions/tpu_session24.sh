#!/bin/bash
# Round-3 session 24 (chains after s23): eval-path A/B after the
# packed-lattice rewrite (renderer.py: per-pass ops at s_max slots instead
# of max_march_steps) — before: 22-33 s/frame at 800x800 (r3s20/eval_800).
# Two arms isolate the two levers: code-only (same 4096 chunk), then
# +16384-ray chunks (amortize per-chunk march/op floors).
set -u
OUT=${1:-/root/repo/results/r3s24}
PREV=${2:-/root/repo/results/r3s23}
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

echo "=== session24 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

runT 1800 eval_800_packed python tools/profile_eval.py --wh 800

runT 1800 eval_800_chunk16k python tools/profile_eval.py --wh 800 --chunk 16384

echo "=== session24 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
