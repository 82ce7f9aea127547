"""Occupancy-grid training CLI (TPU-native rebuild of the reference's
train_real.py — same flags, artifacts, and checkpoint contract).

Usage (reference README):
  python train_real.py --data_root <dir> --scene lego -te -ta -f -ae -df -d
  python train_real.py --scene lego --load_model --render_video
"""

import argparse
import os
import pathlib
import time

import numpy as np

from cednerf_tpu.datasets import (
    DNERF_SYNTHETIC_SCENES,
    DYNERF_SCENES,
    HYPERNERF_SCENES,
)
from cednerf_tpu.engine.cli import (apply_perf_overrides, build_field,
                                    flags_from_args, get_model_args)
from cednerf_tpu.engine.config import config_for_scene


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--data_root", type=str,
        default=str(pathlib.Path.cwd() / "data/dnerf_synthetic"),
        help="the root dir of the dataset",
    )
    parser.add_argument("--train_split", type=str, default="train",
                        choices=["train", "trainval"])
    parser.add_argument(
        "--scene", type=str, default="lego",
        choices=list(DNERF_SYNTHETIC_SCENES) + list(DYNERF_SCENES)
        + list(HYPERNERF_SCENES)
        + ["procedural", "procedural_cloud"],  # dataset-free analytic scenes
    )
    parser.add_argument("--max_steps", type=int, default=None,
                        help="override the preset step count")
    parser.add_argument("--model_path", type=str, default="model_ckpt",
                        help="checkpoint directory (reference: model.pth)")
    parser.add_argument("--gui", action="store_true",
                        help="launch the interactive viewer after training")
    parser.add_argument("--resume", action="store_true",
                        help="resume mid-run from --model_path (step, RNG and "
                             "ray bucket restore bit-exact)")
    parser.add_argument("--ckpt_every", type=int, default=10000,
                        help="rolling-checkpoint interval in steps (0 = only "
                             "the final save, the reference's behavior)")
    parser.add_argument("--isg2ist_step", type=int, default=0,
                        help="DyNeRF: switch ISG->IST importance sampling at "
                             "this step (reference dnerf_3d_video_IS.py:308 "
                             "switch_to_ist; 0 = never)")
    parser.add_argument("--dp", action="store_true",
                        help="ray-sharded data parallelism over all attached "
                             "devices (jax.sharding mesh; gradients GSPMD-"
                             "all-reduced; docs/PARALLELISM.md)")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler trace of 64 steady-state "
                             "steps into this directory (inspect with "
                             "tools/profile_trace.py's aggregator or "
                             "TensorBoard)")
    parser.add_argument("--mark_invisible", action="store_true",
                        help="mark occupancy cells outside all train frustums "
                             "invisible (always on for DyNeRF --gui runs, "
                             "reference train_real.py:205-211)")
    parser = get_model_args(parser)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from cednerf_tpu.utils import enable_compile_cache
    enable_compile_cache()

    from cednerf_tpu.engine.checkpoint import load_checkpoint, save_checkpoint
    from cednerf_tpu.engine.renderer import (eval_chunk_for, make_eval_render_fn,
                                              render_image)
    from cednerf_tpu.engine.train import Trainer, create_train_state
    from cednerf_tpu.utils.image import write_png, write_video
    from cednerf_tpu.utils.metrics import depth_to_img, ms_ssim, psnr

    cfg = config_for_scene(args.scene, args.max_steps)
    if args.hash_levels or args.hash_features:
        import dataclasses

        cfg = dataclasses.replace(
            cfg,
            hash_n_levels=args.hash_levels or cfg.hash_n_levels,
            hash_n_features=args.hash_features or cfg.hash_n_features,
        )
    cfg = apply_perf_overrides(cfg, args)
    env_cfg = os.environ.get("CEDNERF_CFG")
    if env_cfg:
        # arbitrary SceneConfig field overrides for tests/experiments
        # (tiny-shape end-to-end CLI runs); unknown keys fail fast
        import dataclasses
        import json

        cfg = dataclasses.replace(cfg, **json.loads(env_cfg))
        print(f"cfg overrides from CEDNERF_CFG: {env_cfg}")
    flags = flags_from_args(args)
    field = build_field(cfg, flags)

    if args.scene.startswith("procedural"):
        from cednerf_tpu.datasets.procedural import ProceduralLoader as Loader

        loader_kwargs = {}
    elif args.scene in DNERF_SYNTHETIC_SCENES:
        from cednerf_tpu.datasets.dnerf_synthetic import DNeRFSyntheticDataset as Loader

        loader_kwargs = {}
    elif args.scene in HYPERNERF_SCENES:
        from cednerf_tpu.datasets.hypernerf import HyperNeRFDataset as Loader

        loader_kwargs = dict(color_bkgd_aug="black", factor=cfg.dataset_factor,
                             add_cam=cfg.add_cam)
    else:
        from cednerf_tpu.datasets.dynerf import DyNeRFDataset as Loader

        loader_kwargs = dict(factor=cfg.dataset_factor)

    test_kwargs = dict(loader_kwargs)
    if args.scene in DYNERF_SCENES:
        loader_kwargs["color_bkgd_aug"] = cfg.train_bkgd_aug
        test_kwargs["color_bkgd_aug"] = cfg.test_bkgd_aug

    test_dataset = Loader(subject_id=args.scene, root_fp=args.data_root,
                          split="test", num_rays=None, **test_kwargs)

    if args.load_model:
        train_dataset = None
        trainer = None
        state = create_train_state(field, cfg, jax.random.PRNGKey(42))
        state, step = load_checkpoint(args.model_path, state)
        print(f"loaded checkpoint at step {step} from {args.model_path}")
    else:
        train_dataset = Loader(subject_id=args.scene, root_fp=args.data_root,
                               split=args.train_split, num_rays=cfg.init_batch_size,
                               **loader_kwargs)
        # loaders that can generate batches in-jit enable the scanned
        # multi-step fast path (one dispatch per 16 steps); host-sampling
        # loaders (DyNeRF importance sampling) run the same scanned path on
        # stacked host batches, double-buffered against device compute
        device_sampler = (train_dataset.device_sampler()
                          if hasattr(train_dataset, "device_sampler") else None)
        mesh = None
        if args.dp:
            import dataclasses

            from cednerf_tpu.parallel import make_mesh

            mesh = make_mesh()
            # shard-local budget compaction (one block per device)
            cfg = dataclasses.replace(cfg, compact_blocks=mesh.size)
            print(f"data parallel over {mesh.size} device(s)")
        trainer = Trainer(field, cfg, flags, train_dataset, seed=42,
                          device_sampler=device_sampler,
                          stacked_host=device_sampler is None, mesh=mesh)

        if args.scene in DYNERF_SCENES and (args.gui or args.mark_invisible):
            # frustum-cull the occupancy grid (reference train_real.py:205-211)
            from cednerf_tpu.ops.occupancy import mark_invisible_cells

            cam_poses = train_dataset.poses[::train_dataset.images_per_video]
            trainer.state = trainer.state._replace(occ=mark_invisible_cells(
                trainer.state.occ, train_dataset.K, cam_poses,
                train_dataset.width, train_dataset.height,
                near_plane=cfg.near_plane))

        hooks = []
        if args.isg2ist_step and hasattr(train_dataset, "switch_to_ist"):
            hooks.append((args.isg2ist_step, train_dataset.switch_to_ist))
        if args.profile_dir:
            # trace a steady-state window (past warmup + bucket settling)
            t0 = cfg.occ_warmup_steps + 512
            hooks.append(
                (t0, lambda: jax.profiler.start_trace(args.profile_dir)))
            hooks.append((t0 + 64, jax.profiler.stop_trace))

        if args.resume:
            print(f"resumed at step {trainer.resume(args.model_path)}")

        tic = time.time()
        trainer.run(cfg.max_steps, log_every=10000, hooks=hooks,
                    checkpoint_dir=args.model_path,
                    checkpoint_every=args.ckpt_every)
        state = trainer.state
        save_checkpoint(args.model_path, state, trainer.step,
                        trainer.key, trainer.bucket, trainer.steady_march)
        print(f"train time: {time.time() - tic:.2f}s; saved {args.model_path}")

        # evaluation (train_real.py:443-520)
        render_chunk = make_eval_render_fn(field, cfg)
        psnrs, ssims = [], []
        for test_step in range(len(test_dataset)):
            data = test_dataset.image_rays(test_step)
            rgb, acc, depth = render_image(
                field, state.params, state.occ, render_chunk,
                data["origins"], data["viewdirs"], jnp.float32(data["timestamp"]),
                jnp.asarray(data["color_bkgd"]), chunk=eval_chunk_for(cfg),
            )
            psnrs.append(float(psnr(jnp.asarray(rgb), jnp.asarray(data["pixels"]))))
            ssims.append(float(ms_ssim(jnp.asarray(rgb),
                                       jnp.asarray(data["pixels"]))))
            if test_step == 0:
                write_png("rgb_test.png", rgb)
                write_png("depth_test.png", depth_to_img(depth))
                err = np.linalg.norm(rgb - data["pixels"], axis=-1)
                write_png("rgb_error.png", (np.clip(err, 0, 1) * 255).astype(np.uint8))
        print(f"evaluation: psnr_avg={np.mean(psnrs)}, ssim_avg={np.mean(ssims)}")

    if args.render_video:
        # spiral-path video (train_real.py:523-558)
        render_chunk = make_eval_render_fn(field, cfg)
        poses = test_dataset.render_poses()
        rgb_frames, depth_frames = [], []
        bkgd = jnp.zeros(3)
        for i in range(len(poses["c2w"])):
            data = test_dataset.pose_rays(poses, i)
            rgb, acc, depth = render_image(
                field, state.params, state.occ, render_chunk,
                data["origins"], data["viewdirs"], jnp.float32(data["timestamp"]),
                bkgd, chunk=eval_chunk_for(cfg),
            )
            rgb_frames.append(np.flip((rgb * 255).astype(np.uint8), axis=1))
            depth_frames.append(np.flip(depth_to_img(depth), axis=1))
        write_video("rgb_render.mp4", rgb_frames, fps=20)
        write_video("depth_render.mp4", depth_frames, fps=20)

    if args.gui:
        # web-based orbit viewer with time scrubber (reference gui.py parity)
        from cednerf_tpu.viewer import ViewerServer

        train_poses = (np.asarray(train_dataset.camtoworlds)
                       if train_dataset is not None and
                       hasattr(train_dataset, "camtoworlds") else None)
        K = getattr(test_dataset, "K", None)
        server = ViewerServer(
            field, state.params, state.occ, cfg, train_poses=train_poses,
            K=K, wh=(test_dataset.width, test_dataset.height),
            render_bkgd=(jnp.ones(3) if cfg.family == "dnerf" else jnp.zeros(3)),
        )
        server.serve(port=8890)


if __name__ == "__main__":
    main()
