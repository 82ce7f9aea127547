"""Measure ray-coherent duplicate cell rows in the packed sample stream.

The cellfused encoder's backward scatters one [8F]-lane row per (sample,
hashed level) at the v5e per-row wall (~9 ns/row; PERF_PLAN). But packed
samples are ray-major and consecutive samples along a ray stay inside one
encoder cell for ~cell_size/step samples, so at coarse levels long runs of
samples share the SAME cell row. Pre-summing each run's update rows
(segment-sum, exact — scatter-add is commutative and the run pre-sum can
run in f32, more accurate than the bf16 sequential accumulate it would
replace) would shrink the scatter row count by the measured run factor.

This tool measures that factor on the bench workload (BallCloudScene at
steady-state occupancy, real march + budget compaction) per hashed level,
and prints the implied scatter-row reduction for the cellfused backward.
Run on CPU: stats are budget-shape properties, not timings.

Usage: JAX_PLATFORMS=cpu python tools/rowrun_stats.py [--budget 65536]
"""

import argparse
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget", type=int, default=65536)
    ap.add_argument("--steps", type=int, default=240)
    ap.add_argument("--batches", type=int, default=4)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")

    from synthetic_scene import BallCloudScene

    from cednerf_tpu.engine.cli import build_field
    from cednerf_tpu.engine.config import ModelFlags, dnerf_config
    from cednerf_tpu.engine.renderer import pack_budget_samples
    from cednerf_tpu.engine.train import Trainer
    from cednerf_tpu.ops.brick_grid import (BrickGridSpec, _level_geom,
                                            level_scale)
    from cednerf_tpu.ops.occupancy import march_candidates

    flags = ModelFlags(
        use_div_offsets=True, use_feat_predict=True, use_time_embedding=True,
        use_time_attenuation=True, distortion_loss=True, acc_entropy_loss=True,
    )
    cfg = dataclasses.replace(
        dnerf_config(max_steps=100000),
        target_sample_batch_size=args.budget)
    field = build_field(cfg, flags)
    scene = BallCloudScene(n_cams=8, wh=128, n_times=8)
    tr = Trainer(field, cfg, flags, scene, seed=0,
                 device_sampler=scene.device_sampler(), steps_per_call=8)
    while tr.step < args.steps:
        m = tr.run_chunk()
    print(f"# steady: step={tr.step} rays={tr.bucket} "
          f"nsamp={int(m['n_samples'])}")

    hs = field.hash_spec
    spec = BrickGridSpec(
        n_levels=hs.n_levels, n_features=hs.n_features, base_res=hs.base_res,
        max_res=hs.max_res, log2_hashmap_size=hs.log2_hashmap_size,
        max_table_rows=hs.max_table_rows, fine_table_rows=hs.fine_table_rows,
    )
    layout = spec.level_layout()

    rng = np.random.default_rng(7)
    agg = {}
    total_n = 0
    for b in range(args.batches):
        batch = scene.sample(tr.bucket, rng)
        origins = jnp.asarray(batch["origins"])
        viewdirs = jnp.asarray(batch["viewdirs"])
        ts = jnp.asarray(batch["timestamps"])
        cand = march_candidates(
            tr.state.occ, origins, viewdirs,
            near_plane=cfg.near_plane, far_plane=cfg.far_plane,
            render_step_size=cfg.render_step_size, cone_angle=cfg.cone_angle,
            max_march_steps=cfg.max_march_steps,
            stratified_key=jax.random.PRNGKey(b))
        ps = pack_budget_samples(
            origins, viewdirs, cand, ts, budget=args.budget,
            n_blocks=cfg.compact_blocks, assembly_impl="cumsum",
            uniform_dt=cfg.render_step_size)
        aabb = np.asarray(field.aabb, np.float32)
        pos01 = np.asarray((ps.pos - aabb[:3]) / (aabb[3:] - aabb[:3]))
        valid = np.asarray(ps.valid)
        n = int(valid.sum())
        total_n += n
        x = jnp.asarray(pos01[valid])
        for lvl, lay in enumerate(layout):
            if not lay["hashed"]:
                continue
            scale = level_scale(lvl, spec.log_b, spec.base_res)
            rows, intra, _, _ = _level_geom(
                x, scale, lay["n_bricks_axis"], True, lay["rows"])
            crow = np.asarray(rows) * 27 + np.asarray(
                (intra[:, 0] * 3 + intra[:, 1]) * 3 + intra[:, 2])
            runs = 1 + int(np.sum(crow[1:] != crow[:-1]))
            a = agg.setdefault(lvl, [0, 0, lay["res"]])
            a[0] += runs
            a[1] += n

    print(f"# batches={args.batches} total_valid={total_n}")
    tot_rows = tot_runs = 0
    for lvl in sorted(agg):
        runs, n, res = agg[lvl]
        tot_rows += n
        tot_runs += runs
        print(f"level {lvl:2d} res={res:5d}  rows/N={runs/n:.3f}  "
              f"mean_run={n/runs:.2f}")
    print(f"TOTAL hashed scatter rows: {tot_rows} -> {tot_runs} "
          f"(x{tot_runs/tot_rows:.3f}); at 9 ns/row and 1M samples that is "
          f"{9e-9 * (tot_rows - tot_runs) / total_n * 1e6 * 1e3:.1f} ms/step "
          f"saved per 1M samples")


if __name__ == "__main__":
    main()
