"""Multi-chip (virtual 8-device CPU mesh) data-parallel tests: the jitted
train step runs with rays sharded and params replicated, and matches the
single-device result."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from cednerf_tpu.engine.config import ModelFlags, dnerf_config
from cednerf_tpu.engine.train import create_train_state, make_train_step
from cednerf_tpu.models.field import DNGPRadianceField
from cednerf_tpu.parallel import make_mesh, replicate, shard_batch

from synthetic_scene import BallScene


def _setup():
    cfg = dataclasses.replace(
        dnerf_config(max_steps=100),
        # budget >= worst-case demand (512 rays x 128 candidates) so the
        # budgeted compaction never drops samples in this test, and
        # block-local compaction aligned to the 8-device mesh
        target_sample_batch_size=512 * 128, grid_resolution=16,
        render_step_size=2e-2, max_march_steps=128, compact_blocks=8,
    )
    field = DNGPRadianceField(
        aabb=cfg.aabb, n_levels=2, dst_resolution=32, base_resolution=8,
        log2_hashmap_size=10,
    )
    state = create_train_state(field, cfg, jax.random.PRNGKey(0))
    # seed an occupied grid so the march produces samples
    state = state._replace(occ=state.occ._replace(
        binaries=jnp.ones_like(state.occ.binaries)))
    scene = BallScene(wh=32)
    batch = {k: jnp.asarray(v) for k, v in scene.sample(512).items()}
    return cfg, field, state, batch


def test_devices_available():
    assert jax.device_count() == 8


def test_sharded_train_step_matches_single_device():
    """Loss and gradients agree between the replicated-params/sharded-rays
    GSPMD run and the single-device run.

    Gradients (not post-Adam params) are compared: Adam normalizes every
    gradient to a +-lr-sized update, so a symmetric-scene gradient that is
    ~1e-15 on one reduction order and exactly 0.0 on another (bf16 partial
    sums get psum'd in a different order) would blow up into a full-size
    param difference despite both being correct."""
    cfg, field, state, batch = _setup()
    key = jax.random.PRNGKey(7)

    from cednerf_tpu.engine.renderer import render_rays
    from cednerf_tpu.ops.occupancy import march_rays

    @jax.jit
    def loss_and_grad(state, batch):
        samples = march_rays(
            state.occ, batch["origins"], batch["viewdirs"],
            near_plane=cfg.near_plane, far_plane=cfg.far_plane,
            render_step_size=cfg.render_step_size, cone_angle=cfg.cone_angle,
            max_march_steps=cfg.max_march_steps, s_max=32,
            stratified_key=key)

        def loss_fn(params):
            out = render_rays(field, params, batch["origins"],
                              batch["viewdirs"], samples, batch["timestamps"],
                              batch["color_bkgd"], None, train=True)
            return jnp.mean((out.rgb - batch["pixels"]) ** 2)

        return jax.value_and_grad(loss_fn)(state.params)

    ref_loss, ref_grads = loss_and_grad(state, batch)

    mesh = make_mesh(8)
    sharded_state = replicate(state, mesh)
    sharded_batch = shard_batch(batch, mesh)
    loss, grads = loss_and_grad(sharded_state, sharded_batch)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(grads),
                    jax.tree_util.tree_leaves(ref_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2,
                                   atol=1e-6)

    # the full train step (march + render + losses + Adam) also executes
    # sharded without error and stays finite
    step_fn = make_train_step(field, cfg, ModelFlags())
    new_state, metrics = step_fn(sharded_state, sharded_batch, key)
    assert np.isfinite(float(metrics["loss"]))
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(new_state.params))


def test_batch_actually_sharded():
    cfg, field, state, batch = _setup()
    mesh = make_mesh(8)
    sb = shard_batch(batch, mesh)
    shard_shapes = [s.data.shape for s in sb["origins"].addressable_shards]
    assert len(shard_shapes) == 8
    assert all(s[0] == batch["origins"].shape[0] // 8 for s in shard_shapes)
    # scalars (color_bkgd) replicated
    assert len(set(str(s.device) for s in sb["color_bkgd"].addressable_shards)) == 8


def test_two_process_distributed_step():
    """Two OS processes form one 8-device mesh via jax.distributed (Gloo
    CPU collectives) and agree bitwise after a ray-sharded gradient step —
    the multi-host claim in docs/PARALLELISM.md, actually executed
    (VERDICT r1 item 10). Workers: tests/two_proc_worker.py."""
    import os
    import re
    import socket
    import subprocess
    import sys

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = root
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(root, "tests", "two_proc_worker.py"),
             str(port), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=root, text=True)
        for i in range(2)
    ]
    outs = [p.communicate(timeout=110)[0] for p in procs]
    digests = []
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-2000:]
        m = re.search(r"DIGEST (\S+)", o)
        assert m, o[-2000:]
        digests.append(m.group(1))
    assert digests[0] == digests[1], digests


def test_sharded_step_with_pallas_impls():
    """GSPMD composes with the Pallas kernels: the sharded train step with
    scatter_impl='fused' + interp_impl='pallas' compiles and matches the
    XLA-impl sharded step's loss (accumulator-reorder noise only)."""
    cfg, field, state, batch = _setup()
    cfg_p = dataclasses.replace(cfg, scatter_impl="fused",
                                interp_impl="pallas")
    field_p = dataclasses.replace(field, scatter_impl="fused",
                                  interp_impl="pallas")
    mesh = make_mesh(8)
    state_r = replicate(state, mesh)
    sharded = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(3)
    flags = ModelFlags()
    _, m_ref = make_train_step(field, cfg, flags)(state_r, sharded, key)
    _, m_pal = make_train_step(field_p, cfg_p, flags)(state_r, sharded, key)
    ref, pal = float(m_ref["loss"]), float(m_pal["loss"])
    assert abs(ref - pal) < 1e-3 * max(abs(ref), 1.0), (ref, pal)


def test_sharded_eval_render_matches_single_device():
    """render_image(mesh=...) shards chunk rays across the mesh; outputs
    must match the unsharded render (same program, GSPMD-partitioned)."""
    from cednerf_tpu.engine.renderer import make_eval_render_fn, render_image

    cfg, field, state, _ = _setup()
    cfg = dataclasses.replace(cfg, eval_s_max=32)
    scene = BallScene(wh=16)
    img = scene.image_rays(0, 0.5)
    fn = make_eval_render_fn(field, cfg)
    args = (field, state.params, state.occ, fn,
            img["origins"], img["viewdirs"], jnp.float32(0.5),
            jnp.ones(3))
    rgb0, op0, dep0 = render_image(*args, chunk=128)
    mesh = make_mesh(8)
    rgb1, op1, dep1 = render_image(*args, chunk=128, mesh=mesh)
    np.testing.assert_allclose(rgb0, rgb1, atol=2e-5)
    np.testing.assert_allclose(op0, op1, atol=2e-5)
    np.testing.assert_allclose(dep0, dep1, atol=2e-4)


def test_trainer_mesh_matches_single_device():
    """Trainer(mesh=...) runs the scanned device-sampler loop ray-sharded;
    with budget >= demand and equal seeds the loss trajectory matches the
    unsharded Trainer to GSPMD reduction-order tolerance."""
    from cednerf_tpu.engine.train import Trainer

    cfg, field, _, _ = _setup()
    flags = ModelFlags()
    scene = BallScene(wh=32)

    def run(mesh):
        tr = Trainer(field, cfg, flags, scene, seed=3,
                     device_sampler=scene.device_sampler(),
                     steps_per_call=4, mesh=mesh)
        return [tr.run_chunk()["loss"] for _ in range(2)]

    l0 = run(None)
    l1 = run(make_mesh(8))
    np.testing.assert_allclose(l0, l1, rtol=2e-4)
