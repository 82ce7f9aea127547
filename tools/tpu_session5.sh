#!/bin/bash
# Round-2 closing chip schedule (single owner): waits for the running
# val_1m gate, then A/Bs the cumsum assembly path end-to-end, benches the
# winning combos, re-picks bench defaults, and (time permitting) runs the
# full-scale 20k-step texture A/B the earlier sessions never reached.
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

# wait for the val_1m process (pid file) to exit; 45 min cap
if [ -f "$OUT/val.pid" ]; then
  VP=$(cat "$OUT/val.pid")
  for i in $(seq 1 90); do
    kill -0 "$VP" 2>/dev/null || break
    sleep 30
  done
fi
echo "=== session5 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

# A/B: cumsum assembly vs gather, xla + pallas scatters, 262k and 1M.
# (The segment-sum LOSS rewrite is always on — both arms carry it; the
# flag only switches the renderer's ri/base broadcasts.)
runT 3600 sweep_asm_xla python tools/profile_budget.py --iters 12 \
    --impls xla --march_seg 0 --budgets 262144,1048576 --assembly cumsum
runT 3600 sweep_asm_scatp python tools/profile_budget.py --iters 12 \
    --impls pallas --march_seg 0 --budgets 1048576 --assembly cumsum
# baseline re-measure post-loss-rewrite (the rewrite itself may move xla)
runT 3600 sweep_base_xla python tools/profile_budget.py --iters 12 \
    --impls xla --march_seg 0 --budgets 262144,1048576

# benches for promotion (bench_*.log names feed pick_bench_defaults)
runT 2400 bench_asm_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum"}' \
    python bench.py
runT 2400 bench_asm_scatp_1m env CEDNERF_BENCH_CFG='{"scatter_impl": "pallas", "target_sample_batch_size": 1048576, "assembly_impl": "cumsum"}' \
    python bench.py
# Seed the promotion pool with the PRIOR session's winning bench runs and
# quality gates so a slower new arm can never displace the standing
# default, and the 1M-budget arms are PSNR-gated by this session's val_1m
# (pick_bench_defaults picks the fastest gated candidate across the dir).
for f in bench_scatp_1m.log bench_default.log; do
  [ -f "/tmp/tpu_session_r2/$f" ] && cp -n "/tmp/tpu_session_r2/$f" "$OUT/"
done
[ -d /tmp/tpu_session_r2/val_default ] && cp -rn /tmp/tpu_session_r2/val_default "$OUT/"
runT 1200 pick_defaults python tools/pick_bench_defaults.py "$OUT"

# full-scale texture A/B (the round-1 VERDICT item 3 gate): brick L8F4
# default vs reference-exact per-corner gather L16F2 @ log2 21
runT 5400 texture_brick python tools/validate_synthetic.py --steps 20000 \
    --scene texture --levels 8 --features 4 --impl brick \
    --out "$OUT/texture_brick"
runT 5400 texture_gather python tools/validate_synthetic.py --steps 20000 \
    --scene texture --levels 16 --features 2 --impl gather --log2 21 \
    --out "$OUT/texture_gather"
echo "=== session5 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
