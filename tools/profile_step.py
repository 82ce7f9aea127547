"""Component-level timing of the train step at bench shapes, on the real chip.

Times each jitted piece by dispatching K iterations in a lax.scan-free loop
and fetching a scalar to the host (block_until_ready does not synchronize
through the axon tunnel). Prints ms per call per component.

Usage: python tools/profile_step.py [--rays 1024] [--smax 512] [--iters 20]
"""

import argparse
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "tests")
sys.path.insert(0, ".")


def timed(fn, args, iters, name, fetch=None):
    # warm up / compile
    out = fn(*args)
    leaf = fetch(out) if fetch else jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = fetch(out) if fetch else jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {dt:8.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=1024)
    ap.add_argument("--smax", type=int, default=512)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from synthetic_scene import BallCloudScene
    from cednerf_tpu.engine.cli import build_field
    from cednerf_tpu.engine.config import ModelFlags, dnerf_config
    from cednerf_tpu.engine.train import (Trainer, create_train_state,
                                          make_train_step)
    from cednerf_tpu.ops.occupancy import march_candidates
    from cednerf_tpu.utils import enable_compile_cache

    enable_compile_cache()
    flags = ModelFlags(
        use_div_offsets=True, use_feat_predict=True, use_time_embedding=True,
        use_time_attenuation=True, distortion_loss=True, acc_entropy_loss=True,
    )
    cfg = dnerf_config(max_steps=100000)
    field = build_field(cfg, flags)
    scene = BallCloudScene(n_cams=8, wh=128, n_times=8)

    key = jax.random.PRNGKey(0)
    state = create_train_state(field, cfg, key)
    # carve the occupancy grid a bit so marching/compaction behave like
    # steady state: run some warmup steps through the Trainer
    tr = Trainer(field, cfg, flags, scene, seed=0,
                 device_sampler=scene.device_sampler(), steps_per_call=16)
    while tr.step < 320:
        m = tr.run_chunk()
    print(f"# warmed to step {tr.step}, nsamp={int(m['n_samples'])}, "
          f"rays={m['num_rays']}", flush=True)
    state = tr.state
    R, S = args.rays, args.smax

    data, sample_fn = scene.device_sampler()
    batch = jax.jit(lambda d, k: sample_fn(d, k, R))(data, key)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    march = jax.jit(lambda occ, o, d, k: march_candidates(
        occ, o, d, near_plane=cfg.near_plane, far_plane=cfg.far_plane,
        render_step_size=cfg.render_step_size, cone_angle=cfg.cone_angle,
        max_march_steps=cfg.max_march_steps, stratified_key=k))
    timed(march, (state.occ, batch["origins"], batch["viewdirs"], key),
          args.iters, f"march_candidates [{R}x{cfg.max_march_steps}]")

    n_eval = cfg.sample_budget
    x = jnp.clip(jax.random.uniform(key, (n_eval, 3)) * 2.4 - 1.2, -1.2, 1.2)
    t = jax.random.uniform(key, (n_eval, 1))
    d = jnp.ones((n_eval, 3)) / np.sqrt(3.0)

    # encoder only (through the field's hash encoder, incl. motion warp off)
    def enc_fwd(params, x, t):
        return field.apply(params, x, t, method=field.query_density,
                           skip_move=True)["density"]
    timed(jax.jit(enc_fwd), (state.params, x, t), args.iters,
          f"query_density skip_move fwd [{n_eval}]")

    def enc_loss(params, x, t):
        return jnp.sum(enc_fwd(params, x, t))
    timed(jax.jit(jax.grad(enc_loss)), (state.params, x, t), args.iters,
          f"query_density skip_move fwd+bwd [{n_eval}]")

    def dens_fwd(params, x, t):
        return field.apply(params, x, t, method=field.query_density)["density"]
    timed(jax.jit(dens_fwd), (state.params, x, t), args.iters,
          f"query_density fwd [{n_eval}]")

    def dens_loss(params, x, t):
        return jnp.sum(dens_fwd(params, x, t))
    timed(jax.jit(jax.grad(dens_loss)), (state.params, x, t), args.iters,
          f"query_density fwd+bwd [{n_eval}]")

    def full_fwd(params, x, t, d):
        rgb, res = field.apply(params, x, t, d, return_internal=True)
        return jnp.sum(rgb.astype(jnp.float32)) + jnp.sum(res["density"])
    timed(jax.jit(full_fwd), (state.params, x, t, d), args.iters,
          f"field full fwd [{n_eval}]")
    timed(jax.jit(jax.grad(full_fwd)), (state.params, x, t, d), args.iters,
          f"field full fwd+bwd [{n_eval}]")

    step_fn = make_train_step(field, cfg, flags)
    timed(step_fn, (state, batch, key), args.iters,
          f"train_step [{R} rays, budget {n_eval}]",
          fetch=lambda out: out[1]["loss"])
    step_fn_cap = make_train_step(field, cfg, flags, s_cap=cfg.steady_s_cap)
    timed(step_fn_cap, (state, batch, key), args.iters,
          f"train_step s_cap={cfg.steady_s_cap}",
          fetch=lambda out: out[1]["loss"])


if __name__ == "__main__":
    main()
