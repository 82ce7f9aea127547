#!/bin/bash
# Round-5 session 2: shrink-from-full silicon A/B (VERDICT r5 #6), fresh
# trace at the promoted defaults (#3), prop first-chunk floor arms
# (sort-free + compare_all program variants), warm bench preview.
cd /root/repo || exit 1
R=results/r5s2
mkdir -p $R

echo "=== session r5s2b start $(date)" | tee -a $R/session.log


# --- prop floor: warm re-run of the sort-free program (k=16), then the
# compare_all searchsorted variant; cache file sizes tell the program diet
for arm in compare_all; do
  ENVV=""
  [ "$arm" = compare_all ] && ENVV="CEDNERF_PROP_SEARCH=compare_all"
  timeout 1800 env $ENVV python tools/validate_prop.py --steps 64 \
    --rays 8192 --steps_per_call 16 > $R/prop_floor_$arm.log 2>&1
  echo "prop_floor_$arm rc=$? $(date)" | tee -a $R/session.log
  timeout 1800 env $ENVV python tools/validate_prop.py --steps 64 \
    --rays 8192 --steps_per_call 16 > $R/prop_floor_${arm}_warm.log 2>&1
  echo "prop_floor_${arm}_warm rc=$? $(date)" | tee -a $R/session.log
done
ls -laS .jax_cache | head -6 > $R/cache_sizes.txt



# --- shrink-from-full A/B on the short-span ball scene ---
timeout 2400 env CEDNERF_BENCH_SCENE=ball CEDNERF_BENCH_SKIP_TTQ=1 \
  python bench.py > $R/bench_ball_shrink.log 2>&1
echo "bench_ball_shrink rc=$? $(date)" | tee -a $R/session.log
timeout 2400 env CEDNERF_BENCH_SCENE=ball CEDNERF_BENCH_SKIP_TTQ=1 \
  CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576, "assembly_impl": "cumsum", "row_layout": "cell", "steady_march_steps": 1024, "compact_impl": "rayfold", "fine_table_rows": 65536}' \
  python bench.py > $R/bench_ball_pinned_full.log 2>&1
echo "bench_ball_pinned_full rc=$? $(date)" | tee -a $R/session.log

# --- eval: clean (uncontended) cascade rungs + 64k-chunk variant (the
# r5s1 ladder ran against the 20k texture arm; its flat ~3 s floor needs a
# clean read, and doubling the chunk halves the per-chunk fixed costs) ---
timeout 2700 python tools/profile_eval2.py --scene ball --wh 800 \
  --warm_steps 1000 --ladder 256:64,64:32,16:8 \
  > $R/eval4_ball_clean.log 2>&1
echo "eval4_ball_clean rc=$? $(date)" | tee -a $R/session.log
timeout 2700 python tools/profile_eval2.py --scene ball --wh 800 \
  --warm_steps 1000 --chunk 65536 --ladder 256:64,64:32,16:8 \
  > $R/eval4_ball_c64k.log 2>&1
echo "eval4_ball_c64k rc=$? $(date)" | tee -a $R/session.log

# --- fresh trace at the promoted defaults (throughput target list) ---
timeout 2400 python tools/profile_trace.py --out $R/trace --top 48 \
  > $R/trace.log 2>&1
echo "trace rc=$? $(date)" | tee -a $R/session.log

# --- triplane retry: 131k budget trained fine (46.3 dB @1792) but the
# eval render OOM'd at the 32768-ray seg chunk (triplane's [N,L,3,4,F]
# intermediates at 2M-slot passes); retry with a 4096-ray eval chunk
timeout 3600 python tools/validate_synthetic.py --steps 2000 \
  --grid_type triplane --budget 131072 --eval_chunk 4096 \
  --out $R/triplane_131k_v2 > $R/triplane_131k_v2.log 2>&1
echo "triplane_131k_v2 rc=$? $(date)" | tee -a $R/session.log

# --- full bench preview: the exact artifact path the driver runs at round
# end (incl. BOTH new TTQ phases) — validates it and warms every program
timeout 3600 env CEDNERF_BENCH_TTQ_DB=10 python bench.py > $R/bench_full_preview.log 2>&1
echo "bench_full_preview rc=$? $(date)" | tee -a $R/session.log
tail -1 $R/bench_full_preview.log

echo "=== session r5s2b done $(date)" | tee -a $R/session.log
