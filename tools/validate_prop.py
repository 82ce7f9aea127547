"""Proposal-path quality/time-to-quality validation on the procedural scene.

The reference's train_prop_real.py declares proposal networks but never
wires them (SURVEY #2); this validates OUR working PDF-resampling path
end-to-end: trains the flagship field with proposal-network sampling on
tests' BallScene (device-sampled, 16 steps/dispatch — the same production
loop train_prop_real.py uses) and reports the train PSNR trajectory,
held-out eval PSNR, and optional time-to-quality thresholds for the
occupancy-vs-proposal sampler comparison (tools/ttq.py).

Usage: python tools/validate_prop.py [--steps 2000] [--rays 4096]
       [--scene ball|texture] [--ttq_db 24,28,30] [--host]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent / "tests"))

from ttq import TTQTracker


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--scene", choices=("ball", "cloud", "texture"),
                    default="ball")
    ap.add_argument("--ttq_db", default="",
                    help="comma-separated PSNR thresholds; records "
                         "wall-clock to first crossing")
    ap.add_argument("--host", action="store_true",
                    help="per-step host sampling (the pre-scan loop; for "
                         "dispatch-overhead A/Bs only)")
    ap.add_argument("--debug", action="store_true",
                    help="per-chunk NaN-source telemetry (sigma_max, "
                         "finite flags) for divergence diagnosis")
    ap.add_argument("--grad_clip", type=float, default=0.0,
                    help="global-norm gradient clip (0 = off)")
    ap.add_argument("--weight_decay", type=float, default=0.0,
                    help="L2 weight decay (0 = off) — fog-reclaim arm: "
                         "pulls unvisited table entries back below the "
                         "occ cull threshold")
    ap.add_argument("--density_clamp", type=float, default=-1.0,
                    help="pre-activation clamp on the density exp "
                         "(-1 = PropConfig default 20; 0 = off)")
    ap.add_argument("--anneal_steps", type=int, default=0,
                    help="override the proposal anneal schedule (0 = keep "
                         "the 1000-step default)")
    ap.add_argument("-o", "--use_opacity_loss", action="store_true",
                    help="add the reference's opacity loss (-o) — a fog "
                         "suppressor arm for the prop path's novel-view "
                         "floater damage")
    ap.add_argument("--steps_per_call", type=int, default=16,
                    help="scan length per dispatch — the first-chunk "
                         "load/stage floor scales with the scanned program "
                         "(r4: ~200 s cache-warm at 16; this arm measures "
                         "the k ladder)")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cednerf_tpu.utils import enable_compile_cache
    enable_compile_cache()

    from synthetic_scene import BallCloudScene, BallScene, TexturedCloudScene
    from cednerf_tpu.engine.cli import build_field
    from cednerf_tpu.engine.config import ModelFlags, dnerf_config
    from cednerf_tpu.engine.renderer import render_image
    from cednerf_tpu.engine.train_prop import (
        PropConfig, PropTrainer, build_prop_networks, create_prop_train_state,
        make_prop_eval_render_fn, make_prop_train_step)
    from cednerf_tpu.utils.metrics import psnr

    flags = ModelFlags(
        use_div_offsets=True, use_feat_predict=True, use_time_embedding=True,
        use_time_attenuation=True, distortion_loss=True, acc_entropy_loss=True,
        use_opacity_loss=args.use_opacity_loss,
    )
    cfg = dnerf_config(max_steps=args.steps)
    field = build_field(cfg, flags)
    import dataclasses
    pcfg = PropConfig.for_family("dnerf")
    pcfg = dataclasses.replace(
        pcfg, debug=args.debug, grad_clip=args.grad_clip,
        weight_decay=args.weight_decay,
        anneal_steps=args.anneal_steps or pcfg.anneal_steps)
    clamp = pcfg.density_clamp if args.density_clamp < 0 else args.density_clamp
    if clamp > 0:
        field = dataclasses.replace(field, density_clamp=clamp)
    props = build_prop_networks(cfg, pcfg)
    if clamp > 0:
        props = tuple(dataclasses.replace(p, density_clamp=clamp)
                      for p in props)
    scene_cls = {"ball": BallScene, "cloud": BallCloudScene,
                 "texture": TexturedCloudScene}[args.scene]
    scene = scene_cls(n_cams=8, wh=128, n_times=8)

    ttq = TTQTracker([float(t) for t in args.ttq_db.split(",") if t])
    t0 = time.perf_counter()
    history = []
    first_chunk_s = None

    if args.host:
        key = jax.random.PRNGKey(0)
        key, k_init = jax.random.split(key)
        state = create_prop_train_state(field, props, cfg, k_init, pcfg)
        step_fn = make_prop_train_step(field, props, cfg, flags, pcfg)
        m = {}
        for step in range(args.steps):
            key, k_batch, k_step = jax.random.split(key, 3)
            batch = scene.sample(args.rays, k_batch)
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, m = step_fn(state, batch, k_step,
                               jnp.asarray(step, jnp.int32))
            if step % 16 == 15:
                mh = {k: float(v) for k, v in m.items()}
                ttq.update(step + 1, mh["psnr"])
                if step % 256 == 255:
                    history.append((step + 1, mh["psnr"]))
                    print(f"step={step + 1} psnr={mh['psnr']:.2f} "
                          f"loss={mh['loss']:.4f}", flush=True)
        params = state.params
        final_train_psnr = float(m["psnr"])
        steps_done = args.steps
    else:
        trainer = PropTrainer(field, props, cfg, flags, pcfg,
                              scene.device_sampler(), n_rays=args.rays,
                              seed=0, steps_per_call=args.steps_per_call)
        m = {}
        while trainer.step < args.steps:
            m = trainer.run_chunk()
            if first_chunk_s is None:
                first_chunk_s = time.perf_counter() - t0
                print(f"# first chunk ({trainer.steps_per_call} steps) in "
                      f"{first_chunk_s:.1f}s", flush=True)
            ttq.update(trainer.step, m["psnr"])
            if args.debug or trainer.step % 256 < trainer.steps_per_call:
                history.append((trainer.step, m["psnr"]))
                extra = ""
                if args.debug:
                    extra = (f" smax={m['sigma_max']:.3g}"
                             f" wmax={m['w_max']:.3g}"
                             f" pwmax={m['prop_w_max']:.3g}"
                             f" tfin={m['t_finite']:.0f}"
                             f" gfin={m['grads_finite']:.0f}"
                             f" pfin={m['params_finite']:.0f}")
                print(f"step={trainer.step} psnr={m['psnr']:.2f} "
                      f"loss={m['loss']:.4f} "
                      f"nsamp={int(m['n_samples'])}" + extra, flush=True)
        params = trainer.state.params
        final_train_psnr = m["psnr"]
        steps_done = trainer.step
    train_s = time.perf_counter() - t0

    render_fn = make_prop_eval_render_fn(field, props, cfg, pcfg)
    occ = getattr(trainer, "occ", None) if not args.host else None
    gt, origins, viewdirs = scene.eval_view(theta=0.33 * np.pi, t=0.43)
    rgb, _, _ = render_image(field, params, occ, render_fn,
                             origins, viewdirs, jnp.float32(0.43),
                             jnp.ones(3))
    eval_psnr = float(psnr(jnp.asarray(rgb), jnp.asarray(gt)))
    eval_psnr_raw = eval_psnr
    if occ is not None:
        # un-culled comparison row (the fog-damage diagnostic)
        rgb_raw, _, _ = render_image(field, params, None, render_fn,
                                     origins, viewdirs, jnp.float32(0.43),
                                     jnp.ones(3))
        eval_psnr_raw = float(psnr(jnp.asarray(rgb_raw), jnp.asarray(gt)))
    # train-view render through the SAME eval path: separates eval-renderer
    # divergence (deterministic edges, clamp asymmetry) from novel-view
    # generalization damage (floaters) — r4s30 prop_clamp_ttq saw train
    # 42.9 dB but novel-view eval 10.85
    t_train = float(scene.times[3])
    tv = scene.image_rays(0, t_train)
    rgb_tv, _, _ = render_image(field, params, occ, render_fn,
                                tv["origins"], tv["viewdirs"],
                                jnp.float32(t_train), jnp.ones(3))
    train_view_psnr = float(psnr(jnp.asarray(rgb_tv),
                                 jnp.asarray(tv["pixels"])))

    result = {
        "steps": steps_done,
        "rays": args.rays,
        "scene": args.scene,
        "sampler": "prop",
        "loop": "host" if args.host else "scanned",
        "train_seconds": round(train_s, 1),
        "final_train_psnr": round(final_train_psnr, 2),
        "train_view_psnr": round(train_view_psnr, 2),
        "eval_psnr": round(eval_psnr, 2),
        "eval_psnr_raw": round(eval_psnr_raw, 2),
        "steps_per_call": args.steps_per_call,
        "first_chunk_s": round(first_chunk_s or 0.0, 1),
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
        (out / "result.json").write_text(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
