"""Split DyNeRF camera videos into per-frame images + manifest.

CLI replacement for the reference's convert_video2image.py: decodes each
camera .mp4 (2028x2704), downsamples, writes
images_x{factor}/{cam}/{frame}.png and emits the images_x{factor}_list.json
manifest the loaders consume. The manifest schema intentionally preserves the
reference's quirky keys ('weight' means width — dnerf_3d_video.py:96-101
depends on it).

Uses imageio's ffmpeg backend if available, else OpenCV. Usage:
  python tools/convert_video2image.py --scene_dir data/dynerf/flame_salmon_1 \
      [--factor 4]
"""

import argparse
import glob
import json
import os


def iter_video_frames(path):
    try:
        import imageio.v2 as imageio

        reader = imageio.get_reader(path)
        for frame in reader:
            yield frame
        return
    except Exception:
        pass
    import cv2

    cap = cv2.VideoCapture(path)
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        yield frame[..., ::-1]  # BGR -> RGB


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene_dir", required=True)
    p.add_argument("--factor", type=int, default=4)
    args = p.parse_args()

    from PIL import Image

    videos = sorted(glob.glob(os.path.join(args.scene_dir, "cam*.mp4")))
    if not videos:
        raise SystemExit(f"no cam*.mp4 videos under {args.scene_dir}")

    manifest = {"scene": os.path.basename(args.scene_dir.rstrip("/")), "videos": []}
    out_root = os.path.join(args.scene_dir, f"images_x{args.factor}")
    for vid in videos:
        cam = os.path.splitext(os.path.basename(vid))[0]
        cam_dir = os.path.join(out_root, cam)
        os.makedirs(cam_dir, exist_ok=True)
        entries = []
        for idx, frame in enumerate(iter_video_frames(vid)):
            img = Image.fromarray(frame)
            w, h = img.size
            img = img.resize((w // args.factor, h // args.factor), Image.LANCZOS)
            rel = os.path.join(f"images_x{args.factor}", cam, f"{idx:04d}.png")
            img.save(os.path.join(args.scene_dir, rel))
            entries.append({
                "path": rel,
                "idx": idx,
                # (sic) reference manifest schema: 'weight' is the width
                "weight": img.size[0],
                "height": img.size[1],
            })
        manifest["videos"].append({"video_name": cam, "images": entries})
        print(f"{cam}: {len(entries)} frames")

    out = os.path.join(args.scene_dir, f"images_x{args.factor}_list.json")
    with open(out, "w") as f:
        json.dump(manifest, f)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
