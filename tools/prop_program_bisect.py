"""Bisect the prop-loop TPU executable's ~29 MB size (round-5 floor attack).

The proposal train loop's compiled executable is ~29 MB vs the occ loop's
0.55 MB, and staging it through the tunnel is the ~200-270 s first-chunk
floor (results/r5s1 prop_k ladder: the cost is scan-length-independent, so
the bloat is in the program's base content, not the scan body). This tool
compiles STRIPPED variants of the step (compile-only — nothing runs) and
reports each executable's serialized size, isolating the feature that pays.

Usage: python tools/prop_program_bisect.py [--variants a,b,...]
"""

import argparse
import dataclasses
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tests")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="full,nosched,noskip,noprop_loss,"
                    "noresample,norender_aux,plainfield,occ_twin")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from cednerf_tpu.utils import enable_compile_cache
    enable_compile_cache()

    from synthetic_scene import BallScene
    from cednerf_tpu.engine.cli import build_field
    from cednerf_tpu.engine.config import ModelFlags, dnerf_config
    from cednerf_tpu.engine.train_prop import (PropConfig,
                                               build_prop_networks,
                                               create_prop_train_state,
                                               make_prop_optimizer)
    from cednerf_tpu.ops import losses as L
    from cednerf_tpu.ops.occupancy import RaySamples, ray_aabb_intersect
    from cednerf_tpu.ops.proposal import (anneal_factor, proposal_loss,
                                          proposal_sampling)
    from cednerf_tpu.engine.renderer import render_rays

    flags = ModelFlags(
        use_div_offsets=True, use_feat_predict=True, use_time_embedding=True,
        use_time_attenuation=True, distortion_loss=True,
        acc_entropy_loss=True)
    cfg = dnerf_config(max_steps=2000)
    pcfg = PropConfig.for_family("dnerf")
    field = dataclasses.replace(build_field(cfg, flags),
                                density_clamp=pcfg.density_clamp)
    props = build_prop_networks(cfg, pcfg)
    props = tuple(dataclasses.replace(p, density_clamp=pcfg.density_clamp)
                  for p in props)
    scene = BallScene(n_cams=8, wh=128, n_times=8)
    data, sample_fn = scene.device_sampler()
    n_rays = 8192
    state = create_prop_train_state(field, props, cfg,
                                    jax.random.PRNGKey(0), pcfg)
    aabb = np.asarray(cfg.aabb, np.float32)

    def make_step(variant: str):
        use_flags = flags
        if variant == "norender_aux":
            use_flags = ModelFlags()

        if variant == "nosched":
            tx = optax.apply_if_finite(
                optax.adam(1e-2, eps=1e-15), max_consecutive_errors=1000)
        elif variant == "noskip":
            from cednerf_tpu.engine.train import make_optimizer
            tx = make_optimizer(cfg)
        else:
            tx = make_prop_optimizer(cfg, pcfg.grad_clip)

        def step(state, batch, key, step_i):
            anneal = anneal_factor(step_i, pcfg.anneal_steps)
            t_min, t_max = ray_aabb_intersect(
                batch["origins"], batch["viewdirs"], jnp.asarray(aabb))
            near = jnp.maximum(t_min, cfg.near_plane)
            far = jnp.maximum(jnp.minimum(t_max, cfg.far_plane), near + 1e-4)

            def loss_fn(params):
                prop_fns = [
                    (lambda x, p=p, pp=pp: p.apply(pp, x))
                    for p, pp in zip(props, params["props"])
                ]
                if variant == "noresample":
                    n = pcfg.n_final
                    s = jnp.linspace(0.0, 1.0, n + 1)
                    t_edges = near[:, None] + s[None, :] * (far - near)[:, None]
                    t0, t1 = t_edges[:, :-1], t_edges[:, 1:]
                    records = []
                else:
                    t0, t1, records = proposal_sampling(
                        prop_fns, list(pcfg.prop_samples), pcfg.n_final,
                        batch["origins"], batch["viewdirs"], near, far,
                        sampling_type=pcfg.sampling_type, key=key,
                        anneal=anneal)
                samples = RaySamples(t_starts=t0, t_ends=t1,
                                     mask=jnp.ones_like(t0, bool))
                out = render_rays(
                    field, params["field"], batch["origins"],
                    batch["viewdirs"], samples, batch["timestamps"],
                    batch["color_bkgd"], alpha_thre=0.0,
                    train=variant != "plainfield")
                loss = jnp.mean((out.rgb - batch["pixels"]) ** 2)
                if variant not in ("noprop_loss", "noresample"):
                    s0 = (t0 - near[:, None]) / (far - near)[:, None]
                    s1 = (t1 - near[:, None]) / (far - near)[:, None]
                    s_edges = jnp.concatenate([s0, s1[:, -1:]], axis=-1)
                    loss += proposal_loss(records, s_edges,
                                          out.extras["weights"])
                ex = out.extras
                if use_flags.distortion_loss:
                    loss += L.distortion_loss(ex["weights"], t0, t1) * 1e-3
                if use_flags.acc_entropy_loss:
                    loss += L.acc_entropy_loss(out.opacity) * 1e-3
                if use_flags.use_feat_predict and "latent_losses" in ex:
                    loss += jnp.mean(ex["latent_losses"])
                if use_flags.use_weight_predict and "weight_losses" in ex:
                    loss += jnp.mean(ex["weight_losses"])
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            return state._replace(params=params, opt_state=opt_state), loss

        @functools.partial(jax.jit, donate_argnums=(0,))
        def loop(state, data, key, step0):
            def body(state, i):
                k_all = jax.random.fold_in(key, i)
                k_b, k_s = jax.random.split(k_all)
                batch = sample_fn(data, k_b, n_rays, i)
                return step(state, batch, k_s, step0 + i)
            return jax.lax.scan(body, state, jnp.arange(16))

        return loop

    for variant in args.variants.split(","):
        if variant == "occ_twin":
            # reference point: the occ path's scanned loop at the same rays
            from cednerf_tpu.engine.train import make_train_loop
            t0 = time.perf_counter()
            print(f"{variant}: (see jit_train_loop cache entries; skipped)",
                  flush=True)
            continue
        loop = make_step(variant)
        st = create_prop_train_state(field, props, cfg,
                                     jax.random.PRNGKey(0), pcfg)
        if variant == "nosched":
            tx = optax.apply_if_finite(
                optax.adam(1e-2, eps=1e-15), max_consecutive_errors=1000)
            st = st._replace(opt_state=tx.init(st.params))
        elif variant == "noskip":
            from cednerf_tpu.engine.train import make_optimizer
            st = st._replace(opt_state=make_optimizer(cfg).init(st.params))
        t0 = time.perf_counter()
        lowered = loop.lower(st, data, jax.random.PRNGKey(1),
                             jnp.asarray(0, jnp.int32))
        compiled = lowered.compile()
        dt = time.perf_counter() - t0
        try:
            size = len(compiled.runtime_executable().serialize())
        except Exception:
            try:
                size = len(jax.export.export(loop)(  # fallback, unlikely
                    st, data, jax.random.PRNGKey(1),
                    jnp.asarray(0, jnp.int32)).serialize())
            except Exception:
                size = -1
        print(f"{variant}: compile {dt:.1f}s exe_bytes={size}", flush=True)


if __name__ == "__main__":
    main()
