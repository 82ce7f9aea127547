"""Precompute ISG/IST importance-sampling weight maps for a DyNeRF scene.

CLI replacement for the reference's gen_isg_ist.ipynb notebook (SURVEY #25):
ISG weights are psi(diff^2/(diff^2+gamma^2)) against per-camera median
images (gamma 2e-2, or 1e-3 for keyframe runs), normalized to a
distribution; IST weights are max |frame - frame+-s| over shifts s <= 25
clamped at 0.1. Saved as {isg,ist}_weights.npy next to the scene data
(shape [n_cams * n_frames, h, w], float32, normalized).

Usage:
  python tools/gen_isg_ist.py --data_root data/dynerf --scene flame_salmon_1 \
      [--factor 4] [--gamma 2e-2] [--what both]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cednerf_tpu.datasets import native
from cednerf_tpu.datasets.dynerf import isg_weights, ist_weights, load_dynerf_scene


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True)
    p.add_argument("--scene", required=True)
    p.add_argument("--factor", type=int, default=4)
    p.add_argument("--gamma", type=float, default=2e-2)
    p.add_argument("--alpha", type=float, default=0.1)
    p.add_argument("--frame_shift", type=int, default=25)
    p.add_argument("--what", choices=["isg", "ist", "both"], default="both")
    args = p.parse_args()

    data = load_dynerf_scene(args.data_root, args.scene, factor=args.factor,
                             split="train")
    imgs = data["images"]
    n_cams = data["n_cameras"]
    n_frames = data["n_frames_per_cam"]
    h, w = imgs.shape[1:3]
    basedir = os.path.join(
        args.data_root,
        "flame_salmon_1" if "flame_salmon" in args.scene else args.scene,
    )

    if args.what in ("isg", "both"):
        # native C++ path (csrc/weights.cpp): streams per pixel instead of
        # materializing [n_cams, n_frames, h, w, 3] float temporaries
        med = native.native_median_images(imgs, n_cams)
        if med is None:
            med = np.median(
                imgs.reshape(n_cams, n_frames, h, w, 3), axis=1
            ).astype(np.uint8)
        wts = native.native_isg_weights(imgs, med, gamma=args.gamma)
        if wts is None:
            wts = isg_weights(imgs, med, gamma=args.gamma).astype(np.float32)
        wts = wts / wts.sum()
        out = os.path.join(basedir, "isg_weights.npy")
        np.save(out, wts.reshape(-1, h, w))
        print(f"wrote {out} shape={wts.shape}")

    if args.what in ("ist", "both"):
        wts = native.native_ist_weights(imgs, n_cams, alpha=args.alpha,
                                        frame_shift=args.frame_shift)
        if wts is None:
            wts = ist_weights(imgs, n_cams, alpha=args.alpha,
                              frame_shift=args.frame_shift).astype(np.float32)
        wts = wts / wts.sum()
        out = os.path.join(basedir, "ist_weights.npy")
        np.save(out, wts.reshape(-1, h, w))
        print(f"wrote {out} shape={wts.shape}")


if __name__ == "__main__":
    main()
