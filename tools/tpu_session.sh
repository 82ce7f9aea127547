#!/bin/bash
# One-command TPU measurement queue for when the tunnel returns.
# Runs the round-2 decision experiments in priority order, logging to
# $OUT (default /tmp/tpu_session). Each stage is independently skippable;
# later stages still run if an earlier one fails.
#
# Usage: bash tools/tpu_session.sh [outdir]
set -u
OUT=${1:-/tmp/tpu_session}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
  timeout 5400 "$@" > "$OUT/$name.log" 2>&1
  echo "=== $name rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
}

# 0. tunnel sanity (fast fail if still down)
run probe python -c "import jax; print(jax.devices()); import jax.numpy as jnp; print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))"
grep -q 2097152 "$OUT/probe.log" || { echo "TUNNEL STILL DOWN" | tee -a "$OUT/queue.log"; exit 3; }

# 1. numerical check of the Pallas kernels on real Mosaic lowering
run check_pallas python tools/check_pallas_tpu.py

# 2. scatter primitive microbench (pallas VMEM accumulator vs XLA)
run scatter_bench python tools/profile_pallas_scatter.py

# 3. THE decision sweep: budget x scatter impl x seg marching
run budget_sweep python tools/profile_budget.py --iters 12
# 3b. best-combo candidates with pallas interp + compaction
run budget_sweep_pallas python tools/profile_budget.py --iters 12 \
    --impls fused --interp pallas --compact pallas

# 3c. eval/viewer frame-time ladder (slider speed/quality evidence)
run eval_profile python tools/profile_eval.py --wh 256

# 4. current-default bench for a baseline r2 number (even if defaults
#    change later, this anchors the log)
run bench_default python bench.py

echo "QUEUE DONE — read $OUT/*.log, pick defaults, re-run bench.py" \
  | tee -a "$OUT/queue.log"
