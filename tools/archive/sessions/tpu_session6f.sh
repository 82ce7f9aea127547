#!/bin/bash
# Session-6f: texture-gate follow-ups. The 4k gather arm timed out before
# its eval (2.2 s/step at 16 levels of per-corner gathers), but its train
# trajectory leads brick L8F4 by ~1 dB at step 1280 on the adversarial
# texture scene — quantify the mitigation (--fine_table_rows 65536) and
# get equal-step EVAL numbers at a 2000-step horizon all arms can reach.
set -u
OUT=${1:-/tmp/r2s6}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
if [ -f "$OUT/runner.pid" ]; then
  while kill -0 "$(cat "$OUT/runner.pid")" 2>/dev/null; do sleep 30; done
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

echo "=== session6f takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

# L4F8 measured -1.08 dB train vs L8F4 at 4k on the texture scene — the
# honest bench default is L8F4 + the quality-neutral knobs (cell layout is
# parity-exact; sm512 is sample-identical). Measure that combo first.
runT 2400 bench_cellsm_l8f4_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "steady_march_steps": 512, "row_layout": "cell"}' \
    python bench.py
runT 2400 bench_sm512_l8f4_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "steady_march_steps": 512}' \
    python bench.py

runT 7200 texture_gather_2k python tools/validate_synthetic.py --steps 2000 \
    --scene texture --levels 16 --features 2 --impl gather --log2 21 \
    --out "$OUT/texture_gather_2k"
runT 1800 texture_brick_2k python tools/validate_synthetic.py --steps 2000 \
    --scene texture --levels 8 --features 4 --impl brick \
    --out "$OUT/texture_brick_2k"
runT 1800 texture_ftr_2k python tools/validate_synthetic.py --steps 2000 \
    --scene texture --levels 8 --features 4 --impl brick \
    --fine_table_rows 65536 --out "$OUT/texture_ftr_2k"
runT 1800 texture_l4f8_2k python tools/validate_synthetic.py --steps 2000 \
    --scene texture --levels 4 --features 8 --impl brick \
    --out "$OUT/texture_l4f8_2k"
runT 1800 texture_cell_2k python tools/validate_synthetic.py --steps 2000 \
    --scene texture --levels 4 --features 8 --impl brick \
    --row_layout cell --out "$OUT/texture_cell_2k"
# does bigger fine tables close L4F8's texture gap? (capacity hypothesis)
runT 1800 texture_l4f8ftr_2k python tools/validate_synthetic.py --steps 2000 \
    --scene texture --levels 4 --features 8 --impl brick \
    --fine_table_rows 65536 --out "$OUT/texture_l4f8ftr_2k"
echo "=== session6f done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
