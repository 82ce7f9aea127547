"""Quality/throughput validation on the procedural dynamic scene.

Trains the flagship model (published flag combination) on tests'
BallScene for --steps steps, reporting the training PSNR trajectory and a
held-out eval render PSNR (novel camera, mid-sequence time). No dataset
files needed — this is the in-container stand-in for the reference's
empirical PSNR validation (SURVEY §4), and the gate for encoder layout
experiments (e.g. n_levels/n_features tradeoffs).

Usage: python tools/validate_synthetic.py [--steps 2000] [--levels 16]
       [--features 2] [--out /tmp/val]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--levels", type=int, default=16)
    ap.add_argument("--features", type=int, default=2)
    ap.add_argument("--scene", choices=("ball", "cloud", "texture", "mono"),
                    default="ball")
    ap.add_argument("--grid_type", choices=("hash3d", "hash4d", "triplane"),
                    default="hash3d")
    ap.add_argument("--impl", choices=("brick", "gather"), default="brick",
                    help="'gather' = reference-exact per-corner NGP hashing "
                         "(ops/hash_grid.py) for encoder-divergence A/Bs")
    ap.add_argument("--log2", type=int, default=0,
                    help="override log2_hashmap_size (e.g. 21 = reference)")
    ap.add_argument("--grad_accum", choices=("bfloat16", "float32"),
                    default=None, help="override encoder grad accumulator")
    ap.add_argument("--budget", type=int, default=0,
                    help="override target_sample_batch_size (quality gate "
                         "for per-step budget scaling)")
    ap.add_argument("--scatter_impl", default=None,
                    choices=("xla", "pallas", "onehot", "auto", "fused"))
    ap.add_argument("--compact_impl", default=None, choices=("xla", "pallas"))
    ap.add_argument("--fine_from_level", type=int, default=0,
                    help="first level --fine_table_rows applies to "
                         "(0 = keep the preset default 5; use 2 for L4)")
    ap.add_argument("--fine_table_rows", type=int, default=0,
                    help="fine-level brick-table rows (aliasing A/B arm)")
    ap.add_argument("--march_seg", type=int, default=-1,
                    help="override two-stage segment marching (0 = off)")
    ap.add_argument("--interp_impl", default=None, choices=("xla", "pallas"))
    ap.add_argument("--remat_feats", action="store_true")
    ap.add_argument("--row_layout", default=None,
                    choices=("brick", "cell", "cellz", "cellfused"))
    ap.add_argument("--ttq_db", default="",
                    help="comma-separated PSNR thresholds (e.g. '24,28,30'); "
                         "records wall-clock seconds to first chunk whose "
                         "train PSNR crosses each (tools/ttq.py)")
    ap.add_argument("--steady_march", type=int, default=0,
                    help="steady_march_steps (empty-space-skipping lattice; "
                         "0 = full max_march_steps)")
    ap.add_argument("--mini", action="store_true",
                    help="CPU-feasible shrink (wh 64, budget 16k, march 256, "
                         "table rows 2048/log2 16): preliminary A/B deltas "
                         "when the chip is unavailable — NOT the canonical "
                         "gate; collision/boundary regimes scale down with "
                         "the tables")
    ap.add_argument("--eval_chunk", type=int, default=0,
                    help="override the eval chunk (rays) — encoders with "
                         "wide per-sample intermediates (triplane: [N,L,3,"
                         "4,F]) OOM at the default 32768-ray seg chunk's "
                         "2M-slot passes")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cednerf_tpu.utils import enable_compile_cache
    enable_compile_cache()

    from synthetic_scene import BallCloudScene, BallScene
    from cednerf_tpu.engine.cli import build_field
    from cednerf_tpu.engine.config import ModelFlags, dnerf_config
    from cednerf_tpu.engine.renderer import (eval_chunk_for, make_eval_render_fn,
                                             render_image)
    from cednerf_tpu.engine.train import Trainer
    from cednerf_tpu.utils.metrics import psnr

    flags = ModelFlags(
        use_div_offsets=True, use_feat_predict=True, use_time_embedding=True,
        use_time_attenuation=True, distortion_loss=True, acc_entropy_loss=True,
        grid_type=args.grid_type,
    )
    import dataclasses

    cfg = dnerf_config(max_steps=args.steps)
    wh = 128
    if args.mini:
        wh = 64
        # render_step_size scales with the march-step cut so rays still
        # cover the full aabb diagonal (3*sqrt(3) / 2e-2 ~= 260 steps)
        cfg = dataclasses.replace(
            cfg, target_sample_batch_size=16384, max_march_steps=256,
            render_step_size=2e-2, grid_resolution=64, max_table_rows=2048,
            log2_hashmap_size=16, occ_warmup_steps=64)
    if args.log2:
        cfg = dataclasses.replace(cfg, log2_hashmap_size=args.log2)
    if args.grad_accum:
        cfg = dataclasses.replace(cfg, grad_accum_dtype=args.grad_accum)
    if args.budget:
        cfg = dataclasses.replace(cfg, target_sample_batch_size=args.budget)
    if args.scatter_impl:
        cfg = dataclasses.replace(cfg, scatter_impl=args.scatter_impl)
    if args.interp_impl:
        cfg = dataclasses.replace(cfg, interp_impl=args.interp_impl)
    if args.compact_impl:
        cfg = dataclasses.replace(cfg, compact_impl=args.compact_impl)
    if args.fine_table_rows:
        cfg = dataclasses.replace(cfg, fine_table_rows=args.fine_table_rows)
    if args.fine_from_level:
        cfg = dataclasses.replace(cfg, fine_from_level=args.fine_from_level)
    if args.march_seg >= 0:
        cfg = dataclasses.replace(cfg, march_seg=args.march_seg)
    if args.remat_feats:
        cfg = dataclasses.replace(cfg, remat_feats=True)
    if args.steady_march:
        cfg = dataclasses.replace(cfg, steady_march_steps=args.steady_march)
    if args.row_layout:
        cfg = dataclasses.replace(cfg, row_layout=args.row_layout)
    if args.eval_chunk:
        cfg = dataclasses.replace(cfg, eval_chunk=args.eval_chunk,
                                  eval_chunk_seg=args.eval_chunk)
    field = build_field(cfg, flags).clone(
        n_levels=args.levels, n_features_per_level=args.features,
        encoder_impl=args.impl)
    from synthetic_scene import MonocularOrbitScene, TexturedCloudScene

    if args.scene == "mono":
        # vrig capture regime: one camera per timestep (32-frame orbit);
        # eval_view at a train time is the held-out-rig protocol
        scene = MonocularOrbitScene(n_frames=32, wh=wh)
    else:
        scene_cls = {"ball": BallScene, "cloud": BallCloudScene,
                     "texture": TexturedCloudScene}[args.scene]
        scene = scene_cls(n_cams=8, wh=wh, n_times=8)
    trainer = Trainer(field, cfg, flags, scene, seed=0,
                      device_sampler=scene.device_sampler(), steps_per_call=16)

    from ttq import TTQTracker

    ttq = TTQTracker([float(t) for t in args.ttq_db.split(",") if t])
    t0 = time.perf_counter()
    history = []
    while trainer.step < args.steps:
        m = trainer.run_chunk()
        ttq.update(trainer.step, m["psnr"])
        if trainer.step % 256 < trainer.steps_per_call:
            history.append((trainer.step, m["psnr"]))
            print(f"step={trainer.step} psnr={m['psnr']:.2f} "
                  f"rays={m['num_rays']} "
                  f"nsamp={int(m['n_samples'])}", flush=True)
    train_s = time.perf_counter() - t0

    render_fn = make_eval_render_fn(field, cfg)

    # Train-view render through the SAME eval path (cam 0 is at theta=0,
    # t=3/7 is a training time): separates eval-renderer bugs from
    # undertraining — a converged model must reproduce this view.
    t_train = float(scene.times[3])
    tv = scene.image_rays(0, t_train)
    rgb_tv, _, _ = render_image(field, trainer.state.params, trainer.state.occ,
                                render_fn, tv["origins"], tv["viewdirs"],
                                jnp.float32(t_train), jnp.ones(3),
                                chunk=eval_chunk_for(cfg))
    train_view_psnr = float(psnr(jnp.asarray(rgb_tv), jnp.asarray(tv["pixels"])))

    # Held-out eval: novel camera angle + mid-time (not in the train set).
    # Monocular (vrig protocol): novel camera at the NEAREST TRAIN time —
    # each time was seen from one camera only, so the novel view is the
    # held-out rig; an off-train time would confound time interpolation.
    t_eval = 0.43
    if scene.monocular:
        t_eval = float(scene.times[np.argmin(np.abs(scene.times - t_eval))])
    gt, origins, viewdirs = scene.eval_view(theta=0.33 * np.pi, t=t_eval)
    rgb, _, _ = render_image(field, trainer.state.params, trainer.state.occ,
                             render_fn, origins, viewdirs,
                             jnp.float32(t_eval), jnp.ones(3),
                             chunk=eval_chunk_for(cfg))
    eval_psnr = float(psnr(jnp.asarray(rgb), jnp.asarray(gt)))

    result = {
        "steps": args.steps,
        "mini": args.mini,
        "levels": args.levels,
        "features": args.features,
        "scene": args.scene,
        "impl": args.impl,
        "log2": args.log2 or cfg.log2_hashmap_size,
        "grad_accum": cfg.grad_accum_dtype,
        "budget": cfg.target_sample_batch_size,
        "scatter_impl": cfg.scatter_impl,
        "interp_impl": cfg.interp_impl,
        "compact_impl": cfg.compact_impl,
        "fine_table_rows": cfg.fine_table_rows,
        "march_seg": cfg.march_seg,
        "train_seconds": round(train_s, 1),
        "final_train_psnr": round(history[-1][1], 2) if history else None,
        "train_view_psnr": round(train_view_psnr, 2),
        "eval_psnr": round(eval_psnr, 2),
    }
    if ttq.thresholds:
        result.update(ttq.result())
    print(json.dumps(result))
    if args.out:
        out = pathlib.Path(args.out)
        out.mkdir(parents=True, exist_ok=True)
        from cednerf_tpu.utils.image import write_png
        write_png(out / "eval_rgb.png", np.asarray(rgb))
        write_png(out / "eval_gt.png", np.asarray(gt))
        write_png(out / "train_view_rgb.png", np.asarray(rgb_tv))
        write_png(out / "train_view_gt.png", np.asarray(tv["pixels"]))
        (out / "result.json").write_text(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
