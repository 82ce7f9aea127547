#!/bin/bash
# Session-13: (1) re-run the L8F8 structural arm uncontended — the
# session-12 number (2.21M) was contaminated by a stray CPU-intended
# validate run that the sitecustomize redirected onto the chip (fixed in
# utils/platform.py); (2) first on-chip time-to-quality comparison of the
# occupancy-marching path vs the proposal PDF-resampling path
# (tools/ttq.py; BASELINE.json names time-to-30dB a tracked metric) —
# the prop path places ~3x fewer samples/ray, so seconds-to-PSNR is the
# honest cross-sampler scoreboard; (3) prop ray-batch scaling arm.
# Waits for the session-12 runner to release the chip first.
set -u
OUT=${1:-/tmp/r2s13}
PREV=${2:-/tmp/r2s12}
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

echo "=== session13 takes the chip ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"

# 0. extended Mosaic bisect: session-12 narrowed the dma_gather compile
#    crash to {bf16 rows | big tables | 1M-row grids | 32-lane rows} —
#    k7-k10 flip one variable each off the passing k6 config. Cheap and
#    decisive for the round-3 fused-encoder plan.
runT 2700 bisect2 python tools/bisect_pallas.py

# 1. honest L8F8 re-run (64-lane cell rows: gathers at the ~2.1x
#    cheaper-per-row W>=64 regime, same row count, 2x capacity)
runT 2400 bench_cell_l8f8_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "hash_n_features": 8, "row_layout": "cell", "steady_march_steps": 512}' \
    python bench.py

# 1b. 2M-sample budget at the promoted default (the pre-cell budget sweep
#     showed near-linear step scaling; cell+sm512 cut the marginal terms,
#     so re-test whether a bigger batch now amortizes the fixed costs)
runT 2400 bench_cell_2m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 2097152, "assembly_impl": "cumsum", "row_layout": "cell", "steady_march_steps": 512, "remat_feats": true}' \
    python bench.py

# 1c. fine_table_rows=65536 at the promoted cell defaults: the session-12
#     texture gate showed ftr65536 closes the brick-vs-reference-exact
#     train gap to -0.16 dB (27.26 vs 27.42; capped brick was -1.34) — if
#     this arm holds near 2.9M, quality AND speed defaults unify. Risk:
#     65536-row fine bricks make 1.77M-row cell tables, possibly in the
#     degenerate big-table scatter regime (the scatter_rows curve decides).
runT 2400 bench_cell_ftr_1m env CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "cell", "steady_march_steps": 512, "fine_table_rows": 65536}' \
    python bench.py

# 2. time-to-quality, occupancy path at the promoted bench knobs
#    (ball scene, 4k steps; thresholds bracket the scene's converged PSNR)
runT 3600 ttq_occ_4k python tools/validate_synthetic.py \
    --steps 4000 --scene ball --levels 8 --features 4 \
    --row_layout cell --steady_march 512 --budget 1048576 \
    --ttq_db 24,28,30,32 --out "$OUT/ttq_occ_4k"

# 3. time-to-quality, proposal path (same scene/steps; dense shapes,
#    no occupancy grid / marching lattice / compaction)
runT 3600 ttq_prop_4k python tools/validate_prop.py \
    --steps 4000 --rays 8192 --scene ball \
    --ttq_db 24,28,30,32 --out "$OUT/ttq_prop_4k"

# 3b. prop ray-batch scaling (is 16k rays/step a better operating point?)
runT 3600 ttq_prop_4k_16k python tools/validate_prop.py \
    --steps 4000 --rays 16384 --scene ball \
    --ttq_db 24,28,30,32 --out "$OUT/ttq_prop_4k_16k"

# 4. monocular (vrig-regime) quality gate: one camera per timestep,
#    held-out novel camera at a train time — the capture regime of the
#    reference's only published numbers (run_hyper.sh)
runT 3600 val_mono_2k python tools/validate_synthetic.py \
    --steps 2000 --scene mono --levels 8 --features 4 \
    --ttq_db 24,28,30 --out "$OUT/val_mono_2k"

echo "=== session13 done ($(date +%H:%M:%S))" | tee -a "$OUT/queue.log"
