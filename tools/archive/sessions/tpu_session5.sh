#!/bin/bash
# Round-2 closing chip schedule, rev 2 (single owner, time-prioritized):
# benches + default promotion first (they decide BENCH_r02), then the
# assembly A/B sweeps for the perf log, then the texture gate if time
# remains. The earlier rev's runs were invalidated by a surviving first
# instance contending the chip — always check for a live owner first.
set -u
OUT=${1:-/tmp/r2s5}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
runT() {
  local tmo=$1 name=$2; shift 2
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
  timeout "$tmo" "$@" > "$OUT/$name.log" 2>&1
  echo "=== $name rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
}

echo "=== session5r2 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

# benches for promotion (bench_*.log names feed pick_bench_defaults)
runT 2400 bench_asm_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum"}' \
    python bench.py
runT 2400 bench_asm_scatp_1m env CEDNERF_BENCH_CFG='{"scatter_impl": "pallas", "target_sample_batch_size": 1048576, "assembly_impl": "cumsum"}' \
    python bench.py
# Seed the promotion pool with the PRIOR session's winning bench runs and
# quality gates so a slower new arm can never displace the standing
# default; this session's val_1m PSNR-gates the 1M-budget arms.
for f in bench_scatp_1m.log bench_default.log; do
  [ -f "/tmp/tpu_session_r2/$f" ] && cp -n "/tmp/tpu_session_r2/$f" "$OUT/"
done
[ -d /tmp/tpu_session_r2/val_default ] && cp -rn /tmp/tpu_session_r2/val_default "$OUT/"
runT 1200 pick_defaults python tools/pick_bench_defaults.py "$OUT"

# assembly A/B step timings for the perf log (242k + 1M, xla scatter)
runT 3600 sweep_asm_xla python tools/profile_budget.py --iters 12 \
    --impls xla --march_seg 0 --budgets 262144,1048576 --assembly cumsum
runT 3600 sweep_base_xla python tools/profile_budget.py --iters 12 \
    --impls xla --march_seg 0 --budgets 262144,1048576

# full-scale texture gate (round-1 VERDICT item 3), time permitting
runT 5400 texture_brick python tools/validate_synthetic.py --steps 20000 \
    --scene texture --levels 8 --features 4 --impl brick \
    --out "$OUT/texture_brick"
runT 5400 texture_gather python tools/validate_synthetic.py --steps 20000 \
    --scene texture --levels 16 --features 2 --impl gather --log2 21 \
    --out "$OUT/texture_gather"
echo "=== session5r2 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
