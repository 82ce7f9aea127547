#!/bin/bash
# Session-7: level-fused cell encoder (row_layout=cellfused) measurement +
# unattended honest-default promotion. cellfused consolidates all hashed
# levels' cell-table gathers/scatters into ONE op each (fixed per-op cost
# on v5e is ~2.5-5 ms; L8F4 pays it 12x per step in the per-level path).
# Honest arms (L8F4, quality-gated split) run in $OUT and feed
# pick_bench_defaults; L4F8 tradeoff arms run in ${OUT}x so the unattended
# promotion can't pick a split that failed the texture gate.
set -u
OUT=${1:-/tmp/r2s7}
PREV=${2:-/tmp/r2s6}
mkdir -p "$OUT" "${OUT}x"
cd "$(dirname "$0")/.."
# wait for the previous session's runner to release the chip
if [ -f "$PREV/runner.pid" ]; then
  while kill -0 "$(cat "$PREV/runner.pid")" 2>/dev/null; do sleep 30; done
fi
if [ -f "$OUT/runner.pid" ]; then
  while kill -0 "$(cat "$OUT/runner.pid")" 2>/dev/null; do sleep 30; done
fi
echo $$ > "$OUT/runner.pid"
runT() {
  local tmo=$1 name=$2 dir=$3; shift 3
  echo "=== $name: $* ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
  timeout "$tmo" "$@" > "$dir/$name.log" 2>&1 &
  echo $! > "$OUT/child.pid"
  wait $!
  echo "=== $name rc=$? ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
}

echo "=== session7 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

# seed the promotion pool with session-6f's honest L8F4 arms
for f in bench_cellsm_l8f4_1m bench_sm512_l8f4_1m; do
  [ -f "$PREV/$f.log" ] && cp "$PREV/$f.log" "$OUT/"
done

# 1) honest arms: L8F4 cellfused (promotion pool)
runT 2400 bench_cfsm_l8f4_1m "$OUT" env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "cellfused", "steady_march_steps": 512}' \
    python bench.py
runT 2400 bench_cf_l8f4_1m "$OUT" env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "cellfused"}' \
    python bench.py

# 2) tradeoff arms: L4F8 cellfused (documentation only, outside the pool)
runT 2400 bench_cfsm_l4f8_1m "${OUT}x" env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "hash_n_levels": 4, "hash_n_features": 8, "row_layout": "cellfused", "steady_march_steps": 512}' \
    python bench.py

# 3) promote the honest winner into bench_defaults.json
runT 300 promote "$OUT" python tools/pick_bench_defaults.py "$OUT"

# 4) confirm the unattended default path end-to-end (named so the log does
#    NOT re-enter the bench_*.log promotion glob)
runT 2400 confirm_bench "$OUT" python bench.py

# 5) fresh trace of the promoted-shape config for the next attribution pass
runT 2400 trace_cfsm_l8f4 "$OUT" python tools/profile_trace.py \
    --cfg '{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "cellfused", "steady_march_steps": 512}' \
    --out "$OUT/trace_cfsm_l8f4" --top 60

# 6) equal-step texture sanity for cellfused (expected == cell bitwise; this
#    guards the whole shipped combo incl. sm512 + bf16 accum on a real run)
runT 1800 texture_cfsm_2k "${OUT}x" python tools/validate_synthetic.py \
    --steps 2000 --scene texture --levels 8 --features 4 --impl brick \
    --row_layout cellfused --steady_march 512 --out "${OUT}x/texture_cfsm_2k"
echo "=== session7 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
