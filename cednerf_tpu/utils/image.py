"""Host-side image/video IO (PNG + mp4 artifacts, train_real.py:501-515, :557-558)."""

import numpy as np


def write_png(path: str, img) -> None:
    import imageio.v2 as imageio

    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    imageio.imwrite(path, img)


def write_video(path: str, frames, fps: int = 20) -> bool:
    """Write an mp4; falls back to per-frame PNGs if no ffmpeg backend exists.

    Returns True if the video file was written.
    """
    import imageio.v2 as imageio

    try:
        imageio.mimwrite(path, list(frames), fps=fps)
        return True
    except Exception:
        base = path.rsplit(".", 1)[0]
        for i, f in enumerate(frames):
            write_png(f"{base}_{i:04d}.png", f)
        return False
