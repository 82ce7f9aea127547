"""Sweep sample budget x scatter impl for the full train step (real chip).

The r2 trace rollup (ROADMAP) shows the 94 ms step at the 262k budget is
dominated by per-op FIXED costs (XLA scatter ~2.5 ms + gather/cumsum floors
~3-5 ms each); marginal per-sample cost is small. Raising the per-step
sample budget amortizes every fixed cost, so samples/s should rise with
budget until the marginal terms dominate. This measures that curve, and the
scatter-impl alternatives (xla / pallas VMEM accumulator / fused backward
kernel), at steady-state shapes.

Method: warm a Trainer at the default config until the occupancy grid is
carved, then time `make_train_step` directly at a fixed ray count per
budget (R ~ headroom * budget / measured-samples-per-ray), fetching a
metric scalar per iteration (block_until_ready does not synchronize
through the axon tunnel).

Usage: python tools/profile_budget.py [--budgets 262144,524288,1048576]
       [--impls xla,pallas,fused] [--iters 20]
"""

import argparse
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "tests")
sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budgets", default="262144,524288,1048576")
    ap.add_argument("--impls", default="xla,pallas,fused")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warm_steps", type=int, default=320)
    ap.add_argument("--interp", default="xla", choices=("xla", "pallas"),
                    help="encoder interpolation impl for all arms")
    ap.add_argument("--compact", default="xla", choices=("xla", "pallas"),
                    help="budget-compaction impl for all arms")
    ap.add_argument("--remat_feats", action="store_true",
                    help="re-gather encoder rows in the backward (the "
                         "memory enabler for >= 2M budgets)")
    ap.add_argument("--march_seg", type=int, default=-1,
                    help="-1 sweeps {0, 8}; otherwise fixes the segment "
                         "length (0 = dense lattice)")
    ap.add_argument("--assembly", default="gather",
                    choices=("gather", "cumsum"),
                    help="packed-path per-slot assembly impl for all arms")
    ap.add_argument("--overcommit", type=float, default=None,
                    help="seg_overcommit override (seg arms dropped ~50%% "
                         "of valid samples at the 1.5 default: segments "
                         "average ~half-full, so the segment buffer "
                         "truncates while demand is under budget)")
    args = ap.parse_args()

    from synthetic_scene import BallCloudScene
    from cednerf_tpu.engine.cli import build_field
    from cednerf_tpu.engine.config import ModelFlags, dnerf_config
    from cednerf_tpu.engine.train import Trainer, make_train_step
    from cednerf_tpu.utils import enable_compile_cache

    enable_compile_cache()
    flags = ModelFlags(
        use_div_offsets=True, use_feat_predict=True, use_time_embedding=True,
        use_time_attenuation=True, distortion_loss=True, acc_entropy_loss=True,
    )
    cfg = dnerf_config(max_steps=100000)
    field = build_field(cfg, flags)
    scene = BallCloudScene(n_cams=8, wh=128, n_times=8)

    tr = Trainer(field, cfg, flags, scene, seed=0,
                 device_sampler=scene.device_sampler(), steps_per_call=16)
    while tr.step < args.warm_steps:
        m = tr.run_chunk()
    spr = float(m["n_samples"]) / float(m["num_rays"])  # samples per ray
    print(f"# warmed to step {tr.step}: {spr:.1f} samples/ray, "
          f"nsamp={int(m['n_samples'])}", flush=True)
    state = tr.state
    data, sample_fn = scene.device_sampler()
    key = jax.random.PRNGKey(0)

    for budget in [int(b) for b in args.budgets.split(",")]:
        r = max(int(cfg.budget_headroom * budget / spr) // 64 * 64, 64)
        cfg_b = dataclasses.replace(cfg, target_sample_batch_size=budget)
        batch = jax.jit(lambda d, k: sample_fn(d, k, r),
                        static_argnums=())(data, key)
        batch = jax.tree_util.tree_map(jnp.asarray, batch)
        segs = (0, 8) if args.march_seg < 0 else (args.march_seg,)
        for impl in args.impls.split(","):
            for seg in segs:
                over = {} if args.overcommit is None else {
                    "seg_overcommit": args.overcommit}
                cfg_i = dataclasses.replace(cfg_b, scatter_impl=impl,
                                            interp_impl=args.interp,
                                            compact_impl=args.compact,
                                            march_seg=seg,
                                            remat_feats=args.remat_feats,
                                            assembly_impl=args.assembly,
                                            **over)
                field_i = build_field(cfg_i, flags)
                step_fn = make_train_step(field_i, cfg_i, flags,
                                          use_seg=seg > 0)
                try:
                    t_c0 = time.perf_counter()
                    out = step_fn(state, batch, key)
                    nsamp = float(out[1]["n_samples"])
                    compile_s = time.perf_counter() - t_c0
                    # settle one extra call before timing
                    float(step_fn(state, batch, key)[1]["loss"])
                    t0 = time.perf_counter()
                    for _ in range(args.iters):
                        out = step_fn(state, batch, key)
                    float(out[1]["loss"])
                    dt = (time.perf_counter() - t0) / args.iters
                    print(f"budget={budget:8d} R={r:6d} impl={impl:7s} "
                          f"seg={seg} {dt * 1e3:8.2f} ms  "
                          f"{nsamp / dt / 1e6:6.2f} Msamples/s  "
                          f"(compile {compile_s:.0f}s)", flush=True)
                except Exception as e:
                    print(f"budget={budget:8d} impl={impl:7s} seg={seg} "
                          f"FAILED {type(e).__name__}: {str(e)[:160]}",
                          flush=True)


if __name__ == "__main__":
    main()
