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

run() {  # run <name> <cmd...>; runT <seconds> <name> <cmd...> for slow stages
  runT 5400 "$@"
}
runT() {
  local tmo=$1 name=$2; shift 2
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "=== $name rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
}

# 0. tunnel sanity (fast fail if still down)
run probe python -c "import jax; print(jax.devices()); import jax.numpy as jnp; print(float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))"
# ones(256,256) @ ones(256,256) sums to 256^3 = 16777216
grep -q 16777216 "$OUT/probe.log" || { echo "TUNNEL STILL DOWN" | tee -a "$OUT/queue.log"; exit 3; }

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

# 3d. path-to-24M probe: 2M/4M budgets need segment marching to keep the
#     fine lattice ~budget-proportional (PERF_PLAN §"Path to 24M" item 2)
run budget_big_seg8 python tools/profile_budget.py --iters 8 \
    --budgets 2097152,4194304 --impls fused --march_seg 8 \
    --interp pallas --compact pallas --remat_feats
run budget_big_seg16 python tools/profile_budget.py --iters 8 \
    --budgets 2097152,4194304 --impls fused --march_seg 16 \
    --interp pallas --compact pallas --remat_feats

# 4. current-default bench for a baseline r2 number (even if defaults
#    change later, this anchors the log)
run bench_default env CEDNERF_BENCH_LADDER=0 python bench.py

# 5. candidate-combo benches (full bench.py protocol, not just step ms) —
#    these anchor BENCH_r02 default selection without a human in the loop
run bench_fused env CEDNERF_BENCH_CFG='{"scatter_impl": "fused"}' \
    python bench.py
run bench_fused_1m env CEDNERF_BENCH_CFG='{"scatter_impl": "fused", "target_sample_batch_size": 1048576}' \
    python bench.py
run bench_pallas_1m env CEDNERF_BENCH_CFG='{"scatter_impl": "fused", "interp_impl": "pallas", "compact_impl": "pallas", "target_sample_batch_size": 1048576}' \
    python bench.py
run bench_xla_1m_seg env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "march_seg": 8, "remat_feats": true}' \
    python bench.py

# 5b. real-dataset shape: 2^20 budget, host-assembled double-buffered
#     batches (DyNeRF-like; VERDICT r1 item 4's bench). Distinct metric
#     name — the picker only reads train_samples_per_sec rows.
run bench_dynerf_shape env CEDNERF_BENCH_LADDER=0 python bench.py --shape dynerf

# 6. quality gates at the candidate budget (equal-step PSNR, procedural,
#    same scene/steps so the two arms are directly comparable)
run val_default python tools/validate_synthetic.py --steps 2000 \
    --out "$OUT/val_default"
run val_1m python tools/validate_synthetic.py --steps 2000 \
    --budget 1048576 --scatter_impl fused --out "$OUT/val_1m"

# 6b. promote the winning combo for unattended driver bench runs
#     (bench.py reads bench_defaults.json when CEDNERF_BENCH_CFG is unset)
run pick_defaults python tools/pick_bench_defaults.py "$OUT"

# 7. encoder-divergence texture A/B (VERDICT r1 #3): brick L8F4 default vs
#    reference-exact per-corner L16F2 @ 2^21 — 20k steps each. The gather
#    arm runs the slow per-corner encoder (~0.5 s/step) — give it 5 h.
run texture_brick python tools/validate_synthetic.py --steps 20000 \
    --scene texture --levels 8 --features 4 --impl brick \
    --out "$OUT/texture_brick"
runT 18000 texture_ref python tools/validate_synthetic.py --steps 20000 \
    --scene texture --levels 16 --features 2 --impl gather --log2 21 \
    --out "$OUT/texture_ref"

# 8. PERF_PLAN L3 quality gate: 4 levels x 8 features halves scatter count
#    (-40% scatter time on the XLA path) — adoptable only if the texture
#    scene holds PSNR vs the 8x4 default (texture_brick above)
run texture_l4f8 python tools/validate_synthetic.py --steps 20000 \
    --scene texture --levels 4 --features 8 --impl brick \
    --out "$OUT/texture_l4f8"

echo "QUEUE DONE — read $OUT/*.log, pick defaults, re-run bench.py" \
  | tee -a "$OUT/queue.log"
