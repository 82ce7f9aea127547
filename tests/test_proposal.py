"""Proposal-network sampler tests: s/t warps, inverse-CDF resampling,
outer-measure loss, and a short end-to-end training run."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from cednerf_tpu.engine.config import ModelFlags, dnerf_config
from cednerf_tpu.engine.train_prop import (
    PropConfig,
    build_prop_networks,
    create_prop_train_state,
    make_prop_train_step,
)
from cednerf_tpu.models.field import DNGPRadianceField
from cednerf_tpu.ops.proposal import (
    _outer_measure,
    anneal_factor,
    proposal_loss,
    s_to_t,
    sample_from_weights,
    uniform_edges,
)

from synthetic_scene import BallScene


def test_s_to_t_warps():
    s = jnp.asarray([[0.0, 0.5, 1.0]])
    t_u = np.asarray(s_to_t(s, 2.0, 6.0, "uniform"))
    np.testing.assert_allclose(t_u[0], [2.0, 4.0, 6.0], rtol=1e-6)
    t_d = np.asarray(s_to_t(s, 2.0, 6.0, "lindisp"))
    np.testing.assert_allclose(t_d[0], [2.0, 3.0, 6.0], rtol=1e-6)  # 1/(mean inv)
    # per-ray near/far
    t_pr = np.asarray(s_to_t(jnp.ones((2, 3)) * 0.5, jnp.asarray([1.0, 2.0]),
                             jnp.asarray([3.0, 6.0]), "uniform"))
    np.testing.assert_allclose(t_pr[:, 0], [2.0, 4.0], rtol=1e-6)


def test_uniform_edges_monotone():
    e = np.asarray(uniform_edges(4, 16, jax.random.PRNGKey(0)))
    assert e.shape == (4, 17)
    assert (np.diff(e, axis=-1) >= 0).all()
    np.testing.assert_allclose(e[:, 0], 0.0)
    np.testing.assert_allclose(e[:, -1], 1.0)


def test_resampled_edges_monotone_without_sort():
    """sample_from_weights' output is ordered BY CONSTRUCTION (monotone u
    through a monotone CDF inverse) — the round-5 program diet removed the
    defensive sorts from the prop sampler, so this invariant must hold for
    jittered draws over adversarial (spiky/zero-bin) weight profiles."""
    rng = jax.random.PRNGKey(7)
    for i in range(4):
        k1, k2, k3, rng = jax.random.split(rng, 4)
        edges = uniform_edges(8, 32, k1)
        w = jax.random.uniform(k2, (8, 32)) ** 8  # spiky
        w = w.at[:, ::3].set(0.0)                 # plus exact-zero bins
        new = np.asarray(sample_from_weights(edges, w, 16, key=k3))
        assert (np.diff(new, axis=-1) >= 0).all(), i
        e = np.asarray(edges)
        assert (new >= e[:, :1] - 1e-6).all() and (new <= e[:, -1:] + 1e-6).all()


def test_resampling_concentrates_where_weights_are():
    """All weight in bin [0.5, 0.625) -> nearly all new edges in it."""
    edges = jnp.broadcast_to(jnp.linspace(0, 1, 9), (2, 9))
    w = jnp.zeros((2, 8)).at[:, 4].set(1.0)
    new = np.asarray(sample_from_weights(edges, w, 16, padding=1e-4))
    assert new.shape == (2, 17)
    inside = (new >= 0.5 - 1e-3) & (new <= 0.625 + 1e-3)
    assert inside.mean() > 0.85
    assert (np.diff(new, axis=-1) >= -1e-7).all()


def test_outer_measure():
    """Envelope fully covering a query interval contributes all its weight."""
    t_env = jnp.asarray([[0.0, 0.25, 0.5, 0.75, 1.0]])
    w_env = jnp.asarray([[0.1, 0.2, 0.3, 0.4]])
    t_query = jnp.asarray([[0.0, 0.5, 1.0]])
    out = np.asarray(_outer_measure(t_env, w_env, t_query))
    np.testing.assert_allclose(out[0], [0.3, 0.7], atol=1e-6)
    # a query interval strictly inside one env bin gets that bin's weight
    t_q2 = jnp.asarray([[0.26, 0.45]])
    out2 = np.asarray(_outer_measure(t_env, w_env, jnp.asarray([[0.26, 0.45]])))
    np.testing.assert_allclose(out2[0], [0.2], atol=1e-6)


def test_proposal_loss_zero_when_covered():
    from cednerf_tpu.ops.proposal import PropSamples

    s_edges = jnp.broadcast_to(jnp.linspace(0, 1, 5), (1, 5))
    # proposal envelope dominates the final weights -> loss 0
    rec = PropSamples(s_edges=s_edges, weights=jnp.full((1, 4), 0.5))
    final_edges = jnp.broadcast_to(jnp.linspace(0, 1, 9), (1, 9))
    final_w = jnp.full((1, 8), 0.01)
    assert float(proposal_loss([rec], final_edges, final_w)) < 1e-9
    # under-covering envelope -> positive loss
    rec2 = PropSamples(s_edges=s_edges, weights=jnp.zeros((1, 4)))
    final_w2 = jnp.full((1, 8), 0.2)
    assert float(proposal_loss([rec2], final_edges, final_w2)) > 0


def test_anneal_factor():
    assert float(anneal_factor(0)) == 0.0
    assert float(anneal_factor(1000)) == 1.0
    assert 0 < float(anneal_factor(100)) < 1


def test_prop_training_reduces_loss():
    cfg = dataclasses.replace(dnerf_config(max_steps=300),
                              target_sample_batch_size=4096)
    pcfg = PropConfig(prop_resolutions=(64,), prop_samples=(64,), n_final=32,
                      anneal_steps=50)
    field = DNGPRadianceField(
        aabb=cfg.aabb, n_levels=4, dst_resolution=64, base_resolution=8,
        log2_hashmap_size=12, moving_step=cfg.moving_step,
    )
    props = build_prop_networks(cfg, pcfg)
    state = create_prop_train_state(field, props, cfg, jax.random.PRNGKey(0))
    step_fn = make_prop_train_step(field, props, cfg, ModelFlags(), pcfg)

    scene = BallScene(wh=32)
    key = jax.random.PRNGKey(1)
    losses = []
    for i in range(100):
        key, k = jax.random.split(key)
        batch = {k2: jnp.asarray(v) for k2, v in scene.sample(256).items()}
        state, m = step_fn(state, batch, k, i)
        assert np.isfinite(float(m["loss"]))
        losses.append(float(m["mse"]))
    assert np.mean(losses[-10:]) < 0.6 * np.mean(losses[:10]), (
        np.mean(losses[:10]), np.mean(losses[-10:]))


def test_prop_scanned_loop_trains():
    """PropTrainer (scanned 8-steps/dispatch, device sampling) learns on the
    ball scene and reports finite chunk metrics — the production loop of
    train_prop_real.py / tools/validate_prop.py."""
    from cednerf_tpu.engine.train_prop import PropTrainer

    cfg = dataclasses.replace(dnerf_config(max_steps=300),
                              target_sample_batch_size=4096)
    pcfg = PropConfig(prop_resolutions=(64,), prop_samples=(64,), n_final=32,
                      anneal_steps=50)
    field = DNGPRadianceField(
        aabb=cfg.aabb, n_levels=4, dst_resolution=64, base_resolution=8,
        log2_hashmap_size=12, moving_step=cfg.moving_step,
    )
    props = build_prop_networks(cfg, pcfg)
    scene = BallScene(wh=32)
    trainer = PropTrainer(field, props, cfg, ModelFlags(), pcfg,
                          scene.device_sampler(), n_rays=256, seed=0,
                          steps_per_call=8)
    first = trainer.run_chunk()
    assert np.isfinite(first["loss"]) and trainer.step == 8
    for _ in range(11):
        last = trainer.run_chunk()
    assert trainer.step == 96
    assert last["mse"] < 0.6 * first["mse"], (first["mse"], last["mse"])


def test_prop_stacked_host_loop_trains():
    """Stacked-host PropTrainer (the DyNeRF IS shape: host sampling, K
    batches per dispatch) runs and improves."""
    from cednerf_tpu.engine.train_prop import PropTrainer

    cfg = dataclasses.replace(dnerf_config(max_steps=300),
                              target_sample_batch_size=4096)
    pcfg = PropConfig(prop_resolutions=(64,), prop_samples=(64,), n_final=32,
                      anneal_steps=50)
    field = DNGPRadianceField(
        aabb=cfg.aabb, n_levels=4, dst_resolution=64, base_resolution=8,
        log2_hashmap_size=12, moving_step=cfg.moving_step,
    )
    props = build_prop_networks(cfg, pcfg)

    scene = BallScene(wh=32)

    class HostDS:
        def sample(self, n_rays, rng):
            return scene.sample(n_rays)

    trainer = PropTrainer(field, props, cfg, ModelFlags(), pcfg, None,
                          n_rays=256, seed=0, steps_per_call=8,
                          dataset=HostDS())
    first = trainer.run_chunk()
    for _ in range(7):
        last = trainer.run_chunk()
    assert trainer.step == 64
    assert np.isfinite(last["loss"])
    assert last["mse"] < 0.8 * first["mse"], (first["mse"], last["mse"])


def test_prop_occ_eval_culling():
    """PropTrainer maintains an occupancy grid (eval-only culling, r4): it
    carves after warmup, and the prop eval renderer masks samples in
    unoccupied cells — occupied cells must cover the ball so the culled
    render stays close to the raw one where it matters (train view)."""
    from cednerf_tpu.engine.renderer import render_image
    from cednerf_tpu.engine.train_prop import (PropTrainer,
                                               make_prop_eval_render_fn)

    cfg = dataclasses.replace(dnerf_config(max_steps=300),
                              target_sample_batch_size=4096,
                              grid_resolution=16, occ_warmup_steps=16,
                              eval_chunk_seg=256, eval_chunk=256)
    pcfg = PropConfig(prop_resolutions=(64,), prop_samples=(64,), n_final=32,
                      anneal_steps=50)
    field = DNGPRadianceField(
        aabb=cfg.aabb, n_levels=4, dst_resolution=64, base_resolution=8,
        log2_hashmap_size=12, moving_step=cfg.moving_step,
    )
    props = build_prop_networks(cfg, pcfg)
    scene = BallScene(wh=32)
    trainer = PropTrainer(field, props, cfg, ModelFlags(), pcfg,
                          scene.device_sampler(), n_rays=256, seed=0,
                          steps_per_call=8)
    assert trainer.occ is not None
    for _ in range(8):
        m = trainer.run_chunk()
    bins = np.asarray(trainer.occ.binaries)
    assert 0 < bins.sum() < bins.size  # carved: neither empty nor dense
    fn = make_prop_eval_render_fn(field, props, cfg, pcfg)
    tv = scene.image_rays(0, float(scene.times[1]))
    culled, _, _ = render_image(field, trainer.state.params, trainer.occ, fn,
                                tv["origins"], tv["viewdirs"],
                                jnp.float32(float(scene.times[1])),
                                jnp.ones(3), chunk=256)
    raw, _, _ = render_image(field, trainer.state.params, None, fn,
                             tv["origins"], tv["viewdirs"],
                             jnp.float32(float(scene.times[1])),
                             jnp.ones(3), chunk=256)
    # culling may only REMOVE fog: the train view's mse vs gt must not
    # get meaningfully worse than the raw render's
    mse_c = float(np.mean((np.asarray(culled) - tv["pixels"]) ** 2))
    mse_r = float(np.mean((np.asarray(raw) - tv["pixels"]) ** 2))
    assert np.isfinite(mse_c) and mse_c <= mse_r * 1.5 + 1e-3, (mse_c, mse_r)
