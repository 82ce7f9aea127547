#!/bin/bash
# Round-5 session 2a: PSNR/compile-only arms (contention-tolerant).
cd /root/repo || exit 1
R=results/r5s2
mkdir -p $R
echo "=== session r5s2a start $(date)" | tee -a $R/session.log

# prop anneal durability: does the anneal fix hold through 4k steps?
timeout 3600 python tools/validate_prop.py --steps 4000 --rays 8192 \
  --anneal_steps 8000 --out $R/prop_anneal8k_4k > $R/prop_anneal8k_4k.log 2>&1
echo "prop_anneal8k_4k rc=$? $(date)" | tee -a $R/session.log

# prop fog-suppressor arm: opacity loss (-o)
timeout 2700 python tools/validate_prop.py --steps 1500 --rays 8192 -o \
  --out $R/prop_opacity > $R/prop_opacity.log 2>&1
echo "prop_opacity rc=$? $(date)" | tee -a $R/session.log

# prop program-size bisect (compile-only; TPU backend sizes)
timeout 3600 python tools/prop_program_bisect.py \
  --variants full,noresample,noprop_loss,plainfield,noskip,nosched,norender_aux \
  > $R/prop_bisect.log 2>&1
echo "prop_bisect rc=$? $(date)" | tee -a $R/session.log

echo "=== session r5s2a done $(date)" | tee -a $R/session.log
