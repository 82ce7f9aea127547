"""Decompose the seg-eval per-chunk FIXED floor (round 5).

The r5s2 clean ladder measured a ~3.1 s/frame floor independent of s_max/
budget (s16:8 = 3.13 s vs exact 4.14 s) and of chunk size (c64k identical)
— so the floor is per-chunk work proportional to C*Ms: the coarse probe
(pos math + pooled lookup) and the occupied-order argsort. This times each
piece standalone at the eval shapes.

Usage: python tools/profile_eval_probe.py [--wh 800] [--warm_steps 400]
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
    ap.add_argument("--warm_steps", type=int, default=400)
    ap.add_argument("--chunk", type=int, default=32768)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from synthetic_scene import BallScene
    from cednerf_tpu.engine.cli import build_field
    from cednerf_tpu.engine.config import ModelFlags, dnerf_config
    from cednerf_tpu.engine.train import Trainer
    from cednerf_tpu.ops.occupancy import (coarse_lookup, pooled_binaries,
                                           ray_aabb_intersect)
    from cednerf_tpu.utils import enable_compile_cache

    enable_compile_cache()
    flags = ModelFlags(
        use_div_offsets=True, use_feat_predict=True, use_time_embedding=True,
        use_time_attenuation=True, distortion_loss=True,
        acc_entropy_loss=True)
    cfg = dnerf_config(max_steps=100000)
    field = build_field(cfg, flags)
    scene = BallScene(n_cams=8, wh=128, n_times=8)
    tr = Trainer(field, cfg, flags, scene, seed=0,
                 device_sampler=scene.device_sampler(), steps_per_call=16)
    while tr.step < args.warm_steps:
        tr.run_chunk()
    print(f"# warmed to {tr.step}", flush=True)

    eval_scene = BallScene(n_cams=8, wh=args.wh, n_times=8)
    gt, origins, viewdirs = eval_scene.eval_view(theta=0.3 * np.pi, t=0.5)
    o = jnp.asarray(np.asarray(origins, np.float32).reshape(-1, 3))
    d = jnp.asarray(np.asarray(viewdirs, np.float32).reshape(-1, 3))
    c = args.chunk
    n_chunks = o.shape[0] // c
    occ = tr.state.occ
    seg, pool = 8, 4
    m = cfg.max_march_steps
    ms = m // seg
    step = cfg.render_step_size
    seg_len = seg * step
    from cednerf_tpu.engine.renderer import _seg_dilate
    dilate = _seg_dilate(cfg, seg, pool)

    def probe_core(occ_state, oo, dd):
        coarse = pooled_binaries(occ_state, pool=pool, dilate=dilate)
        t_min, t_max = ray_aabb_intersect(oo, dd, occ_state.aabbs[-1])
        t_min = jnp.maximum(t_min, cfg.near_plane)
        t_max = jnp.minimum(t_max, cfg.far_plane)
        s = jnp.arange(ms, dtype=jnp.float32)
        t_lo = t_min[:, None] + s[None, :] * seg_len
        t_hi = jnp.maximum(jnp.minimum(t_lo + seg_len, t_max[:, None]), t_lo)
        tm = t_lo + 0.5 * (t_hi - t_lo)
        pos = oo[:, None, :] + dd[:, None, :] * tm[..., None]
        hit = coarse_lookup(occ_state, coarse, pos)
        return (t_lo < t_max[:, None]) & hit

    probe_j = jax.jit(lambda s_, oo, dd: jnp.sum(probe_core(s_, oo, dd)))

    @jax.jit
    def probe_sort(occ_state, oo, dd):
        sv = probe_core(occ_state, oo, dd)
        order = jnp.argsort(jnp.logical_not(sv), axis=-1,
                            stable=True).astype(jnp.int32)
        return jnp.sum(order) + jnp.sum(sv)

    @jax.jit
    def probe_scatter_rank(occ_state, oo, dd):
        # sort-free packing: lane cumsum rank + one flat delta scatter
        sv = probe_core(occ_state, oo, dd)
        inc = jnp.cumsum(sv.astype(jnp.int32), axis=-1)
        rank = jnp.where(sv, inc - 1, ms)          # invalid -> ms (dropped)
        cc = sv.shape[0]
        ridx = jax.lax.broadcasted_iota(jnp.int32, sv.shape, 0)
        dst = jnp.where(sv, ridx * ms + rank, cc * ms)
        lane = jax.lax.broadcasted_iota(jnp.int32, sv.shape, 1)
        order = (jnp.full((cc * ms + 1,), ms, jnp.int32)
                 .at[dst.reshape(-1)]
                 .set(lane.reshape(-1), mode="drop"))[:cc * ms]
        return jnp.sum(order) + jnp.sum(sv)

    for name, fn in (("probe_only", probe_j), ("probe+argsort", probe_sort),
                     ("probe+scatter_rank", probe_scatter_rank)):
        # warm
        float(fn(occ, o[:c], d[:c]))
        t0 = time.perf_counter()
        for i in range(n_chunks):
            r = fn(occ, o[i * c:(i + 1) * c], d[i * c:(i + 1) * c])
        float(r)
        dt = (time.perf_counter() - t0) * 1e3
        print(f"{name}: {dt:8.1f} ms/frame ({n_chunks} chunks)", flush=True)


if __name__ == "__main__":
    main()
