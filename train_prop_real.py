"""Proposal-network training CLI (the *working* equivalent of the reference's
train_prop_real.py, which declares proposal networks but never wires them and
imports a missing module — SURVEY §2a#2).

Same flag surface as train_real.py; sampling uses hierarchical proposal
PDF-resampling instead of the occupancy grid.
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
    )
    parser.add_argument("--train_split", type=str, default="train",
                        choices=["train", "trainval"])
    parser.add_argument(
        "--scene", type=str, default="lego",
        choices=DNERF_SYNTHETIC_SCENES + DYNERF_SCENES + HYPERNERF_SCENES,
    )
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--num_rays", type=int, default=8192,
                        help="fixed ray batch (the proposal path needs no "
                             "dynamic sample batching: shapes are dense)")
    parser.add_argument("--model_path", type=str, default="model_prop_ckpt",
                        help="checkpoint dir (saved at end of training; "
                             "--load_model restores it — reference "
                             "train_prop_real.py:213,459,547 contract)")
    parser.add_argument("--grad_clip", type=float, default=-1.0,
                        help="global-norm gradient clip for the joint "
                             "field+proposal optimizer (-1 = family "
                             "default; 0 = off)")
    parser.add_argument("--density_clamp", type=float, default=-1.0,
                        help="pre-activation cap on the density exp "
                             "(-1 = family default; 0 = off)")
    parser = get_model_args(parser)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from cednerf_tpu.utils import enable_compile_cache
    enable_compile_cache()

    from cednerf_tpu.engine.renderer import render_image
    from cednerf_tpu.engine.train_prop import (
        PropConfig,
        PropTrainer,
        build_prop_networks,
        make_prop_eval_render_fn,
    )
    from cednerf_tpu.utils.image import write_png
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
        # arbitrary SceneConfig overrides for tiny-shape test runs
        import dataclasses
        import json

        cfg = dataclasses.replace(cfg, **json.loads(env_cfg))
        print(f"cfg overrides from CEDNERF_CFG: {env_cfg}")
    flags = flags_from_args(args)
    field = build_field(cfg, flags)
    import dataclasses

    pcfg = PropConfig.for_family(cfg.family)
    if args.grad_clip >= 0:
        pcfg = dataclasses.replace(pcfg, grad_clip=args.grad_clip)
    clamp = (pcfg.density_clamp if args.density_clamp < 0
             else args.density_clamp)
    if clamp > 0:
        field = dataclasses.replace(field, density_clamp=clamp)
    props = build_prop_networks(cfg, pcfg)
    if clamp > 0:
        props = tuple(dataclasses.replace(p, density_clamp=clamp)
                      for p in props)

    if args.scene in DNERF_SYNTHETIC_SCENES:
        from cednerf_tpu.datasets.dnerf_synthetic import DNeRFSyntheticDataset as Loader

        loader_kwargs = {}
    elif args.scene in HYPERNERF_SCENES:
        from cednerf_tpu.datasets.hypernerf import HyperNeRFDataset as Loader

        loader_kwargs = dict(color_bkgd_aug="black", factor=cfg.dataset_factor,
                             add_cam=cfg.add_cam)
    else:
        from cednerf_tpu.datasets.dynerf import DyNeRFDataset as Loader

        loader_kwargs = dict(factor=cfg.dataset_factor,
                             color_bkgd_aug=cfg.train_bkgd_aug)

    train_dataset = Loader(subject_id=args.scene, root_fp=args.data_root,
                           split=args.train_split, num_rays=args.num_rays,
                           **loader_kwargs)
    test_kwargs = dict(loader_kwargs)
    if args.scene in DYNERF_SCENES:
        test_kwargs["color_bkgd_aug"] = cfg.test_bkgd_aug
    test_dataset = Loader(subject_id=args.scene, root_fp=args.data_root,
                          split="test", num_rays=None, **test_kwargs)

    from cednerf_tpu.engine.checkpoint import (load_prop_checkpoint,
                                               save_prop_checkpoint)

    if args.load_model:
        # reference contract: --load_model skips training and renders from
        # the checkpoint (train_prop_real.py:213-214,459)
        from cednerf_tpu.engine.train_prop import create_prop_train_state
        from cednerf_tpu.ops.occupancy import create_occ_grid

        state = create_prop_train_state(field, props, cfg,
                                        jax.random.PRNGKey(42), pcfg)
        occ = create_occ_grid(cfg.aabb, cfg.grid_resolution, cfg.grid_nlvl)
        state, occ, step, _ = load_prop_checkpoint(args.model_path, state, occ)
        print(f"loaded prop checkpoint at step {step} from {args.model_path}")
    else:
        # Scanned 16-steps/dispatch loop: device sampling when the loader
        # fits HBM (DNeRF/HyperNeRF), host-assembled stacked batches
        # otherwise (DyNeRF IS) — engine/train_prop.py PropTrainer.
        sampler = (train_dataset.device_sampler()
                   if hasattr(train_dataset, "device_sampler") else None)
        trainer = PropTrainer(field, props, cfg, flags, pcfg, sampler,
                              n_rays=args.num_rays, seed=42,
                              steps_per_call=16,
                              dataset=None if sampler else train_dataset)

        tic = time.time()
        m = {"loss": 0.0, "psnr": 0.0, "n_samples": 0.0}
        while trainer.step < cfg.max_steps:
            m = trainer.run_chunk()
            if trainer.step % 10000 < trainer.steps_per_call:
                print(
                    f"elapsed_time={time.time() - tic:.2f}s | "
                    f"step={trainer.step} | loss={m['loss']:.5f} | "
                    f"psnr={m['psnr']:.2f} | "
                    f"n_rendering_samples={int(m['n_samples'])} |"
                )
        print(f"train time: {time.time() - tic:.2f}s")
        state = trainer.state
        occ = trainer.occ
        save_prop_checkpoint(args.model_path, state, occ, trainer.step,
                             trainer.key)
        print(f"saved {args.model_path}")

    render_chunk = make_prop_eval_render_fn(field, props, cfg, pcfg)
    if not args.load_model:
        psnrs, ssims = [], []
        for test_step in range(len(test_dataset)):
            data = test_dataset.image_rays(test_step)
            rgb, acc, depth = render_image(
                field, state.params, occ, render_chunk,
                data["origins"], data["viewdirs"],
                jnp.float32(data["timestamp"]),
                jnp.asarray(data["color_bkgd"]), chunk=cfg.eval_chunk,
            )
            psnrs.append(float(psnr(jnp.asarray(rgb),
                                    jnp.asarray(data["pixels"]))))
            ssims.append(float(ms_ssim(jnp.asarray(rgb),
                                       jnp.asarray(data["pixels"]))))
            if test_step == 0:
                write_png("rgb_test.png", rgb)
                write_png("depth_test.png", depth_to_img(depth))
        print(f"evaluation: psnr_avg={np.mean(psnrs)}, "
              f"ssim_avg={np.mean(ssims)}")

    if args.render_video:
        # spiral-path video from the (possibly just-restored) prop state —
        # reference train_prop_real.py:523-558 contract
        from cednerf_tpu.utils.image import write_video

        poses = test_dataset.render_poses()
        rgb_frames, depth_frames = [], []
        bkgd = jnp.zeros(3)
        for i in range(len(poses["c2w"])):
            data = test_dataset.pose_rays(poses, i)
            rgb, acc, depth = render_image(
                field, state.params, occ, render_chunk,
                data["origins"], data["viewdirs"],
                jnp.float32(data["timestamp"]), bkgd, chunk=cfg.eval_chunk,
            )
            rgb_frames.append(np.flip((rgb * 255).astype(np.uint8), axis=1))
            depth_frames.append(np.flip(depth_to_img(depth), axis=1))
        write_video("rgb_render.mp4", rgb_frames, fps=20)
        write_video("depth_render.mp4", depth_frames, fps=20)


if __name__ == "__main__":
    main()
