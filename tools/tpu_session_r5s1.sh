#!/bin/bash
# Round-5 session 1: prop novel-view protocol (VERDICT r5 #1), eval cascade
# ladder (#2), alternative-encoder gates (#7/#8). Serialized — one chip.
cd /root/repo || exit 1
R=results/r5s1
mkdir -p $R

echo "=== session r5s1 start $(date)" | tee $R/session.log

# --- 1. prop novel-view protocol (occ-culled eval is the default) ---
timeout 2700 python tools/validate_prop.py --steps 1500 --rays 8192 \
  --ttq_db 24,28,30,32 --out $R/prop_nv_1500 > $R/prop_nv_1500.log 2>&1
echo "prop_nv_1500 rc=$? $(date)" | tee -a $R/session.log
timeout 3600 python tools/validate_prop.py --steps 4000 --rays 8192 \
  --ttq_db 24,28,30,32 --out $R/prop_nv_4000 > $R/prop_nv_4000.log 2>&1
echo "prop_nv_4000 rc=$? $(date)" | tee -a $R/session.log
timeout 2700 python tools/validate_prop.py --steps 1500 --rays 8192 \
  --grad_clip 1.0 --out $R/prop_gclip > $R/prop_gclip.log 2>&1
echo "prop_gclip rc=$? $(date)" | tee -a $R/session.log
timeout 2700 python tools/validate_prop.py --steps 1500 --rays 8192 \
  --anneal_steps 3000 --out $R/prop_anneal > $R/prop_anneal.log 2>&1
echo "prop_anneal rc=$? $(date)" | tee -a $R/session.log

# --- 1b. first-chunk floor ladder (k = scan length per dispatch) ---
for k in 16 4 1; do
  timeout 1800 python tools/validate_prop.py --steps 64 --rays 8192 \
    --steps_per_call $k > $R/prop_k$k.log 2>&1
  echo "prop_k$k rc=$? $(date)" | tee -a $R/session.log
done

# --- 2. eval cascade ladder (contract scene first) ---
timeout 3600 python tools/profile_eval2.py --scene ball --wh 800 \
  --warm_steps 1000 --ladder 256:64,128:64,64:64,64:32,16:8 \
  > $R/eval3_ball_800.log 2>&1
echo "eval3_ball_800 rc=$? $(date)" | tee -a $R/session.log
timeout 3600 python tools/profile_eval2.py --scene cloud --wh 800 \
  --warm_steps 1000 --ladder 256:64,64:32 > $R/eval3_cloud_800.log 2>&1
echo "eval3_cloud_800 rc=$? $(date)" | tee -a $R/session.log

# --- 3. gates: hash4d on texture + mono; triplane at a budget that fits ---
timeout 3600 python tools/validate_synthetic.py --steps 2000 \
  --grid_type hash4d --scene texture --out $R/h4d_texture \
  > $R/h4d_texture.log 2>&1
echo "h4d_texture rc=$? $(date)" | tee -a $R/session.log
timeout 3600 python tools/validate_synthetic.py --steps 2000 \
  --grid_type hash4d --scene mono --out $R/h4d_mono > $R/h4d_mono.log 2>&1
echo "h4d_mono rc=$? $(date)" | tee -a $R/session.log
timeout 3600 python tools/validate_synthetic.py --steps 2000 \
  --grid_type triplane --budget 131072 --out $R/triplane_131k \
  > $R/triplane_131k.log 2>&1
echo "triplane_131k rc=$? $(date)" | tee -a $R/session.log

echo "=== session r5s1 done $(date)" | tee -a $R/session.log
