"""Dump the optimized HLO of the steady-state train_loop program so trace
fusion names (tools/profile_trace.py) can be mapped back to JAX source ops.

Usage:
  python tools/dump_train_hlo.py --n_rays 2112 --out /tmp/hlo_dump
  grep -A3 'fusion.1666 =' /tmp/hlo_dump/*after_optimizations*.txt
"""

import argparse
import sys

sys.path.insert(0, "tests")
sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_rays", type=int, default=2112)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--out", default="/tmp/hlo_dump")
    ap.add_argument("--cfg", default=None,
                    help="JSON dict of SceneConfig field overrides (match "
                         "the traced config, e.g. the 1M budget)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from synthetic_scene import BallCloudScene
    from cednerf_tpu.engine.cli import build_field
    from cednerf_tpu.engine.config import ModelFlags, dnerf_config
    from cednerf_tpu.engine.train import Trainer, make_train_loop

    flags = ModelFlags(
        use_div_offsets=True, use_feat_predict=True, use_time_embedding=True,
        use_time_attenuation=True, distortion_loss=True, acc_entropy_loss=True,
    )
    cfg = dnerf_config(max_steps=100000)
    if args.cfg:
        import dataclasses
        import json
        cfg = dataclasses.replace(cfg, **json.loads(args.cfg))
    field = build_field(cfg, flags)
    scene = BallCloudScene(n_cams=8, wh=128, n_times=8)
    trainer = Trainer(field, cfg, flags, scene, seed=0,
                      device_sampler=scene.device_sampler(),
                      steps_per_call=args.steps)
    data, sample_fn = trainer.device_sampler
    loop = make_train_loop(field, cfg, flags, args.n_rays, sample_fn,
                           args.steps, warmup_phase=False)
    lowered = loop.lower(trainer.state, data, trainer.timestamps_pool,
                         jax.random.PRNGKey(0), jnp.asarray(0, jnp.int32))
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = f"{args.out}.txt"
    with open(out, "w") as f:
        f.write(txt)
    print("wrote", out, len(txt), "bytes")


if __name__ == "__main__":
    main()
