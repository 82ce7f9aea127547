#!/bin/bash
# Round-2 follow-up measurement queue: the Mosaic-fixed Pallas arms that
# failed in tpu_session.sh's first pass, plus a 1M-budget trace to find the
# superlinear scaling term. Writes into the SAME outdir so
# pick_bench_defaults sees the union of both sessions' bench logs.
# The texture quality A/Bs (VERDICT r1 #3) run last (overnight-sized).
#
# Usage: bash tools/tpu_session2.sh [outdir]
set -u
OUT=${1:-/tmp/tpu_session_r2}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

runT() {
  local tmo=$1 name=$2; shift 2
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "=== $name rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
}
run() { runT 5400 "$@"; }

# 1. VMEM-RMW scatter microbench — the L1 decision number
run scatter_bench2 python tools/profile_pallas_scatter.py

# 2. where do the 462 ms go at 1M budget (xla arms scale ~linearly with
#    budget, killing the L2 amortization model — find the term)
run trace_1m python tools/profile_trace.py --out "$OUT/trace_1m" \
    --cfg '{"target_sample_batch_size": 1048576}' --warm-chunks 10

# 3. fixed-kernel sweep arms (seg=0: seg marching measured ~50% valid)
run sweep_fused python tools/profile_budget.py --iters 10 \
    --impls fused --interp pallas --compact pallas --march_seg 0
run sweep_scatpallas python tools/profile_budget.py --iters 10 \
    --impls pallas --march_seg 0

# 4. full-protocol benches of the fixed combos (names distinct from
#    session 1's so both sets compete in pick_bench_defaults)
run bench_fusedf env CEDNERF_BENCH_CFG='{"scatter_impl": "fused", "interp_impl": "pallas", "compact_impl": "pallas"}' \
    python bench.py
run bench_fusedf_1m env CEDNERF_BENCH_CFG='{"scatter_impl": "fused", "interp_impl": "pallas", "compact_impl": "pallas", "target_sample_batch_size": 1048576}' \
    python bench.py
run bench_scatp_1m env CEDNERF_BENCH_CFG='{"scatter_impl": "pallas", "target_sample_batch_size": 1048576}' \
    python bench.py

# 5. promote the winner for unattended driver benches
run pick_defaults2 python tools/pick_bench_defaults.py "$OUT"

# 6. encoder-divergence texture A/B (VERDICT r1 #3) — overnight block
run texture_brick python tools/validate_synthetic.py --steps 20000 \
    --scene texture --levels 8 --features 4 --impl brick \
    --out "$OUT/texture_brick"
runT 18000 texture_ref python tools/validate_synthetic.py --steps 20000 \
    --scene texture --levels 16 --features 2 --impl gather --log2 21 \
    --out "$OUT/texture_ref"
run texture_l4f8 python tools/validate_synthetic.py --steps 20000 \
    --scene texture --levels 4 --features 8 --impl brick \
    --out "$OUT/texture_l4f8"

echo "QUEUE2 DONE" | tee -a "$OUT/queue.log"
