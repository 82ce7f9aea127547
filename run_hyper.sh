#!/bin/bash
# HyperNeRF vrig suite — the reference's published-results ledger
# (reference run_hyper.sh:1-16: flags -te -ta -f -ae -df -d, factor 2,
# 20k steps; recorded PSNR/MS-SSIM/train-seconds per scene as comments).
# Run each line on a TPU host with the dataset at $DATA_ROOT; train_real.py
# prints psnr_avg / msssim_avg and elapsed seconds in the same format.
#
# Reference numbers to beat (2023-05-24 run, single CUDA GPU; BASELINE.md):
#   vrig_broom        21.6097 dB / 0.6614 / 585.38 s
#   vrig_3dprinter    23.1074 dB / 0.8213 / 425.14 s
#   vrig_chicken      28.3701 dB / 0.9318 / 622.36 s
#   vrig_peel-banana  24.5094 dB / 0.8780 / 504.06 s
#   mean              24.4 dB / 0.823 / 534 s
DATA_ROOT=${DATA_ROOT:-./data/hypernerf}

python train_real.py --data_root "$DATA_ROOT" --scene vrig_broom -te -ta -f -ae -df -d
python train_real.py --data_root "$DATA_ROOT" --scene vrig_3dprinter -te -ta -f -ae -df -d
python train_real.py --data_root "$DATA_ROOT" --scene vrig_chicken -te -ta -f -ae -df -d
python train_real.py --data_root "$DATA_ROOT" --scene vrig_peel-banana -te -ta -f -ae -df -d

# TPU results ledger (append psnr/ssim/seconds per run here, like the
# reference did; no real HyperNeRF captures exist in this container —
# procedural-scene proxies are tracked in docs/QUALITY.md instead)
