#!/bin/bash
# Round-5 session 3: the reference-exact texture A/B to completion
# (VERDICT r5 #4) + the full-20k default-arm schedule gate.
# Equal protocol: texture scene, equal LR schedule, equal steps; the
# per-corner reference-exact arm costs ~20x per step, so it is bounded by
# timeout and compared at the last common logged step.
cd /root/repo || exit 1
R=results/r5s3
mkdir -p $R

echo "=== session r5s3 start $(date)" | tee $R/session.log

# default arm (promoted: brick L8F4 + ftr65536), 4k steps — fast
timeout 3600 python tools/validate_synthetic.py --steps 4096 --scene texture \
  --levels 8 --features 4 --fine_table_rows 65536 \
  --out $R/tex_default_4k > $R/tex_default_4k.log 2>&1
echo "tex_default_4k rc=$? $(date)" | tee -a $R/session.log

# default arm, full 20k reference schedule (the gate the promotion rests on)
timeout 5400 python tools/validate_synthetic.py --steps 20480 --scene texture \
  --levels 8 --features 4 --fine_table_rows 65536 \
  --out $R/tex_default_20k > $R/tex_default_20k.log 2>&1
echo "tex_default_20k rc=$? $(date)" | tee -a $R/session.log

# reference-exact arm (per-corner gather L16F2 @ 2^21) — ~20x step cost;
# runs to the time budget, logs PSNR every 256 steps for the equal-step read
timeout 9000 python tools/validate_synthetic.py --steps 4096 --scene texture \
  --impl gather --levels 16 --features 2 --log2 21 \
  --out $R/tex_ref_4k > $R/tex_ref_4k.log 2>&1
echo "tex_ref_4k rc=$? $(date)" | tee -a $R/session.log

echo "=== session r5s3 done $(date)" | tee -a $R/session.log
