"""Eval frame-time profile v2: seg vs lattice impl, demand decomposition.

Round-4 instrument for VERDICT r3 next #1 (eval 17-38 s/frame -> <= 1 s).
Measures, on a warmed procedural scene:

  1. DEMAND: per-ray valid-sample counts, occupied-segment counts, and the
     early-termination depth (samples to transmittance < 1e-4) — the
     quantities that decide how much field work a frame fundamentally needs;
  2. the ms/frame ladder of profile_eval.py for a chosen impl + chunk, so
     seg vs lattice A/B at identical warm state;
  3. phase timings for the seg path (coarse probe pass alone vs full).

Usage: python tools/profile_eval2.py [--wh 800] [--warm_steps 1000]
       [--impl seg|lattice] [--chunk 32768] [--demand_only]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "tests")
sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wh", type=int, default=800)
    ap.add_argument("--warm_steps", type=int, default=1000)
    ap.add_argument("--impl", default="seg", choices=("seg", "lattice"))
    ap.add_argument("--chunk", type=int, default=0,
                    help="0 = impl-matched default (eval_chunk_for)")
    ap.add_argument("--demand_only", action="store_true")
    ap.add_argument("--scene", choices=("cloud", "ball"), default="cloud",
                    help="cloud: volumetric BallCloudScene (adversarial "
                         "demand, ~100+ valid samples/ray); ball: opaque "
                         "BallScene (surface-like — the reference capture "
                         "regime the interactive contract targets)")
    ap.add_argument("--ladder", default="256:64,128:64,64:32,32:16,16:8",
                    help="s_max:budget_per_ray pairs")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from synthetic_scene import BallCloudScene, BallScene
    from cednerf_tpu.engine.cli import build_field
    from cednerf_tpu.engine.config import ModelFlags, dnerf_config
    from cednerf_tpu.engine.renderer import (eval_chunk_for,
                                             make_eval_render_fn,
                                             render_image)
    from cednerf_tpu.engine.train import Trainer
    from cednerf_tpu.ops.occupancy import (march_candidates, pooled_binaries)
    from cednerf_tpu.utils import enable_compile_cache
    from cednerf_tpu.utils.metrics import psnr

    enable_compile_cache()
    flags = ModelFlags(
        use_div_offsets=True, use_feat_predict=True, use_time_embedding=True,
        use_time_attenuation=True, distortion_loss=True, acc_entropy_loss=True,
    )
    cfg = dnerf_config(max_steps=100000)
    field = build_field(cfg, flags)
    scene_cls = BallCloudScene if args.scene == "cloud" else BallScene
    scene = scene_cls(n_cams=8, wh=128, n_times=8)
    tr = Trainer(field, cfg, flags, scene, seed=0,
                 device_sampler=scene.device_sampler(), steps_per_call=16)
    t0 = time.perf_counter()
    while tr.step < args.warm_steps:
        tr.run_chunk()
    print(f"# warmed to step {tr.step} in {time.perf_counter()-t0:.0f}s",
          flush=True)

    eval_scene = scene_cls(n_cams=8, wh=args.wh, n_times=8)
    gt, origins, viewdirs = eval_scene.eval_view(theta=0.3 * np.pi, t=0.5)
    o = jnp.asarray(np.asarray(origins, np.float32).reshape(-1, 3))
    d = jnp.asarray(np.asarray(viewdirs, np.float32).reshape(-1, 3))
    n_rays = o.shape[0]

    # ---- demand decomposition on a ray slice (the full lattice field
    # query binds memory: 4096 rays x 1024 slots x 256 lanes bf16 ~ 2 GB)
    ns = min(4096, n_rays)
    idx = np.linspace(0, n_rays - 1, ns).astype(np.int32)
    os_, ds_ = o[idx], d[idx]

    @jax.jit
    def demand_stats(params, occ):
        cand = march_candidates(
            occ, os_, ds_, near_plane=cfg.near_plane,
            far_plane=cfg.far_plane, render_step_size=cfg.render_step_size,
            cone_angle=cfg.cone_angle, max_march_steps=cfg.max_march_steps)
        vcnt = jnp.sum(cand.valid, axis=-1)                    # [R]
        # occupied segments of 8
        m = cand.valid.shape[1]
        segv = jnp.any(cand.valid[:, :m // 8 * 8].reshape(ns, -1, 8), axis=-1)
        scnt = jnp.sum(segv, axis=-1)
        # early-termination depth: sigma at valid samples, samples until
        # trans < 1e-4 (uses the real field)
        t_mid = cand.t_starts + 0.5 * cand.dts
        pos = os_[:, None, :] + ds_[:, None, :] * t_mid[..., None]
        tq = jnp.full((pos.shape[0] * pos.shape[1], 1), 0.5, jnp.float32)
        dirs = jnp.broadcast_to(ds_[:, None, :], pos.shape).reshape(-1, 3)
        _, res = field.apply(params, pos.reshape(-1, 3), tq, dirs,
                             return_internal=False)
        sig = res["density"].astype(jnp.float32).reshape(ns, -1)
        sd = jnp.where(cand.valid, sig * cand.dts, 0.0)
        od = jnp.cumsum(sd, axis=-1)
        alive = od < -np.log(1e-4)                              # trans>1e-4
        useful = jnp.sum(cand.valid & alive, axis=-1)
        return vcnt, scnt, useful

    vcnt, scnt, useful = [np.asarray(x) for x in
                          demand_stats(tr.state.params, tr.state.occ)]
    for name, a in (("valid/ray", vcnt), ("segs8/ray", scnt),
                    ("useful/ray(es1e-4)", useful)):
        print(f"# demand {name}: mean={a.mean():.1f} p50={np.median(a):.0f} "
              f"p90={np.percentile(a, 90):.0f} max={a.max()}", flush=True)
    print(f"# frame demand: valid={vcnt.mean()*n_rays/1e6:.1f}M "
          f"useful={useful.mean()*n_rays/1e6:.1f}M "
          f"(x{n_rays} rays)", flush=True)
    if args.demand_only:
        return

    chunk = args.chunk or (eval_chunk_for(cfg) if args.impl == "seg"
                           else cfg.eval_chunk)
    print(f"# impl={args.impl} chunk={chunk}", flush=True)
    ref_rgb = None
    for pair in args.ladder.split(","):
        s_max, bpr = (int(v) for v in pair.split(":"))
        fn = make_eval_render_fn(field, cfg, s_max=s_max, budget_per_ray=bpr,
                                 impl=args.impl)
        rgb, _, _ = render_image(field, tr.state.params, tr.state.occ, fn,
                                 origins, viewdirs, jnp.float32(0.5),
                                 jnp.ones(3), chunk=chunk)
        t0 = time.perf_counter()
        for _ in range(3):
            rgb, _, _ = render_image(field, tr.state.params, tr.state.occ,
                                     fn, origins, viewdirs, jnp.float32(0.5),
                                     jnp.ones(3), chunk=chunk)
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
