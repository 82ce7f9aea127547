"""Proposal-path quality validation on the procedural dynamic scene.

The reference's train_prop_real.py declares proposal networks but never
wires them (SURVEY #2); this validates OUR working PDF-resampling path
end-to-end: trains the flagship field with proposal-network sampling on
tests' BallScene and reports train PSNR trajectory + held-out eval PSNR.

Usage: python tools/validate_prop.py [--steps 2000] [--rays 4096]
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
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cednerf_tpu.utils import enable_compile_cache
    enable_compile_cache()

    from synthetic_scene import BallScene
    from cednerf_tpu.engine.cli import build_field
    from cednerf_tpu.engine.config import ModelFlags, dnerf_config
    from cednerf_tpu.engine.renderer import render_image
    from cednerf_tpu.engine.train_prop import (
        PropConfig, build_prop_networks, create_prop_train_state,
        make_prop_eval_render_fn, make_prop_train_step)
    from cednerf_tpu.utils.metrics import psnr

    flags = ModelFlags(
        use_div_offsets=True, use_feat_predict=True, use_time_embedding=True,
        use_time_attenuation=True, distortion_loss=True, acc_entropy_loss=True,
    )
    cfg = dnerf_config(max_steps=args.steps)
    field = build_field(cfg, flags)
    pcfg = PropConfig.for_family("dnerf")
    props = build_prop_networks(cfg, pcfg)
    scene = BallScene(n_cams=8, wh=128, n_times=8)

    key = jax.random.PRNGKey(0)
    key, k_init = jax.random.split(key)
    state = create_prop_train_state(field, props, cfg, k_init)
    step_fn = make_prop_train_step(field, props, cfg, flags, pcfg)

    t0 = time.perf_counter()
    history = []
    m = {}
    for step in range(args.steps):
        key, k_batch, k_step = jax.random.split(key, 3)
        batch = scene.sample(args.rays, k_batch)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        state, m = step_fn(state, batch, k_step, jnp.asarray(step, jnp.int32))
        if step % 256 == 0:
            m = {k: float(v) for k, v in m.items()}
            history.append((step, m["psnr"]))
            print(f"step={step} psnr={m['psnr']:.2f} loss={m['loss']:.4f}",
                  flush=True)
    train_s = time.perf_counter() - t0

    render_fn = make_prop_eval_render_fn(field, props, cfg, pcfg)
    gt, origins, viewdirs = scene.eval_view(theta=0.33 * np.pi, t=0.43)
    rgb, _, _ = render_image(field, state.params, None, render_fn,
                             origins, viewdirs, jnp.float32(0.43),
                             jnp.ones(3))
    eval_psnr = float(psnr(jnp.asarray(rgb), jnp.asarray(gt)))

    result = {
        "steps": args.steps,
        "rays": args.rays,
        "train_seconds": round(train_s, 1),
        "final_train_psnr": round(float(m["psnr"]), 2),
        "eval_psnr": round(eval_psnr, 2),
    }
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
