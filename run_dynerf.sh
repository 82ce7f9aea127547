#!/bin/bash
# DyNeRF (Neural 3D Video) suite — mirrors reference run_dynerf.sh:1
# (flags -te -ta -df -f -wr -ae + --render_video; no recorded numbers
# exist in the reference repo for this config).
# ISG/IST importance weights must exist first:
#   python tools/gen_isg_ist.py --data_root "$DATA_ROOT" --scene flame_salmon_1
DATA_ROOT=${DATA_ROOT:-./data/3d_video}

python train_real.py --data_root "$DATA_ROOT" --scene flame_salmon_1 \
    -te -ta -df -f -wr -ae --render_video

# TPU results ledger (append psnr/ssim/seconds per run here)
