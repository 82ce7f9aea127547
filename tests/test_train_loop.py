"""Scanned multi-step training path tests (device sampling + lax.scan)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from cednerf_tpu.engine.config import ModelFlags, dnerf_config
from cednerf_tpu.engine.sampling import dnerf_device_data, make_image_stack_sampler
from cednerf_tpu.engine.train import Trainer
from cednerf_tpu.models.field import DNGPRadianceField

from synthetic_scene import BallScene


def tiny_cfg():
    return dataclasses.replace(
        dnerf_config(max_steps=200),
        target_sample_batch_size=4096, grid_resolution=32,
        render_step_size=2e-2, max_march_steps=256,
        occ_warmup_steps=24, occ_update_interval=8,
    )


def tiny_field(cfg):
    return DNGPRadianceField(
        aabb=cfg.aabb, n_levels=4, dst_resolution=64, base_resolution=8,
        log2_hashmap_size=12, moving_step=cfg.moving_step,
    )


def test_run_chunk_trains():
    cfg = tiny_cfg()
    scene = BallScene(wh=32)
    field = tiny_field(cfg)
    trainer = Trainer(field, cfg, ModelFlags(), scene, seed=0,
                      device_sampler=scene.device_sampler(), steps_per_call=8)
    first = trainer.run_chunk()
    assert trainer.step == 8
    for _ in range(11):
        last = trainer.run_chunk()
    assert trainer.step == 96
    assert np.isfinite(last["loss"])
    assert last["mse"] < 0.7 * first["mse"], (first["mse"], last["mse"])
    # occupancy got updated inside the scan
    assert bool(jnp.any(trainer.state.occ.binaries))


def test_steady_march_auto_repair():
    """A steady lattice shorter than the occupied span loss-masks rays
    forever (measured -8 view dB on the texture scene, r3s20); the Trainer
    must detect the span truncation via complete_frac and grow the lattice
    toward max_march_steps."""
    # budget >> demand so the only truncation cause is the steady lattice
    cfg = dataclasses.replace(tiny_cfg(), steady_march_steps=16,
                              target_sample_batch_size=16384)
    scene = BallScene(wh=32)
    field = tiny_field(cfg)
    trainer = Trainer(field, cfg, ModelFlags(), scene, seed=0,
                      device_sampler=scene.device_sampler(),
                      steps_per_call=8)
    assert trainer.steady_march == 16
    # persistence = 3 incomplete chunks per doubling; 4 doublings to max
    for _ in range(18):
        m = trainer.run_chunk()
    # 16 slots truncate (occupied spans run from first-occupied cell to the
    # traversal end); the repair doubles per incomplete chunk up to
    # max_march_steps, where the skip disables and every ray completes
    assert trainer.steady_march > 16, trainer.steady_march
    assert m["complete_frac"] > 0.99, m


def test_run_dispatches_fast_path():
    cfg = dataclasses.replace(tiny_cfg(), max_steps=16)
    scene = BallScene(wh=32)
    field = tiny_field(cfg)
    trainer = Trainer(field, cfg, ModelFlags(), scene, seed=1,
                      device_sampler=scene.device_sampler(), steps_per_call=8)
    logs = []
    trainer.run(cfg.max_steps, log_every=8, log_fn=logs.append)
    assert trainer.step >= 16
    assert logs  # logged at least once


def test_resume_bit_exact(tmp_path):
    """Kill-and-resume == uninterrupted: state, RNG key and bucket all
    round-trip through the rolling checkpoint (VERDICT r1 item 8)."""
    cfg = dataclasses.replace(tiny_cfg(), max_steps=40)
    scene = BallScene(wh=32)
    field = tiny_field(cfg)
    ckpt = str(tmp_path / "ckpt")

    # interrupted run: 4 chunks, rolling checkpoint every 16 steps
    a = Trainer(field, cfg, ModelFlags(), scene, seed=3,
                device_sampler=scene.device_sampler(), steps_per_call=8)
    a.run(24, log_every=0, checkpoint_dir=ckpt, checkpoint_every=16)
    assert a.step == 32  # loop runs while step <= total

    # resume in a fresh process-equivalent: new Trainer, restore, continue
    b = Trainer(field, cfg, ModelFlags(), scene, seed=999,  # seed overwritten
                device_sampler=scene.device_sampler(), steps_per_call=8)
    assert b.resume(ckpt) == 32
    b.run(40, log_every=0)

    # uninterrupted control with the original seed
    c = Trainer(field, cfg, ModelFlags(), scene, seed=3,
                device_sampler=scene.device_sampler(), steps_per_call=8)
    c.run(40, log_every=0)

    assert b.step == c.step
    jax.tree_util.tree_map(
        lambda va, vb: np.testing.assert_array_equal(np.asarray(va),
                                                     np.asarray(vb)),
        b.state.params, c.state.params)


def test_run_hooks_fire_once_at_step():
    cfg = dataclasses.replace(tiny_cfg(), max_steps=24)
    scene = BallScene(wh=32)
    field = tiny_field(cfg)
    trainer = Trainer(field, cfg, ModelFlags(), scene, seed=0,
                      device_sampler=scene.device_sampler(), steps_per_call=8)
    fired = []
    trainer.run(24, log_every=0,
                hooks=[(16, lambda: fired.append(trainer.step)),
                       (0, lambda: fired.append(-trainer.step or -1))])
    assert fired[0] == -1          # step-0 hook before the first chunk
    assert fired[1] == 16          # fired exactly when step reached 16
    assert len(fired) == 2         # each hook only once


def test_stacked_host_path_trains():
    """stacked_host Trainer runs the scanned loop on host-assembled batches
    (the DyNeRF overlap path) and trains on a DyNeRF fixture."""
    import tempfile

    from test_datasets import make_dynerf_fixture
    from cednerf_tpu.datasets.dynerf import DyNeRFDataset

    with tempfile.TemporaryDirectory() as root:
        make_dynerf_fixture(root)
        ds = DyNeRFDataset("cook_spinach", root, "train", num_rays=32,
                           factor=4, sampling="uniform")
        cfg = dataclasses.replace(tiny_cfg(), max_steps=16)
        trainer = Trainer(tiny_field(cfg), cfg, ModelFlags(), ds, seed=0,
                          steps_per_call=4, stacked_host=True)
        assert trainer._stacked and trainer.device_sampler[0] is None
        m1 = trainer.run_chunk()
        assert trainer._prefetched is not None  # double buffer primed
        m2 = trainer.run_chunk()
        assert trainer.step == 8
        assert np.isfinite(m1["loss"]) and np.isfinite(m2["loss"])


def test_stacked_sampler_slices_by_step():
    from cednerf_tpu.engine.sampling import make_stacked_sampler

    sample = make_stacked_sampler()
    data = {"origins": jnp.arange(24.0).reshape(4, 2, 3),
            "color_bkgd": jnp.arange(12.0).reshape(4, 3)}
    out = sample(data, None, 2, 2)
    np.testing.assert_array_equal(np.asarray(out["origins"]),
                                  np.asarray(data["origins"][2]))
    np.testing.assert_array_equal(np.asarray(out["color_bkgd"]),
                                  np.asarray(data["color_bkgd"][2]))


def test_hyper_device_sampler_matches_host_rays():
    """HyperNeRF device sampler == host loader ray math on a fixture."""
    from test_datasets import make_hypernerf_fixture
    from cednerf_tpu.datasets.hypernerf import HyperNeRFDataset
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        make_hypernerf_fixture(root)
        ds = HyperNeRFDataset("vrig_test", root, "train", num_rays=16,
                              factor=2, add_cam=True)
        data, sample = ds.device_sampler()
        batch = jax.jit(sample, static_argnums=2)(
            data, jax.random.PRNGKey(0), 16)
        # one image per batch (hypernerf.py:456-461): all origins identical
        assert np.ptp(np.asarray(batch["origins"]), axis=0).max() == 0.0
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(batch["viewdirs"]), axis=-1), 1.0,
            atol=1e-5)
        # pin the image and pixels; compare against the host camera model
        img, y, x = 1, 3, 7
        one = sample(
            {**data, "timestamps": data["timestamps"]},
            jax.random.PRNGKey(3), 4)
        host_dirs = ds._camera_dirs(img)
        dev_local = np.asarray(data["local_dirs"][data["cam_group"][img]])
        world = dev_local[y, x] @ np.asarray(data["orientations"][img])
        world /= np.linalg.norm(world)
        np.testing.assert_allclose(world, host_dirs[y, x], atol=1e-5)
        np.testing.assert_allclose(np.asarray(data["positions"][img]),
                                   ds.cameras[img].position, atol=1e-6)
        assert one["pixels"].shape == (4, 3)


def test_image_stack_sampler_matches_host_rays():
    """Device sampler ray math == host loader ray math on a DNeRF fixture."""
    from test_datasets import make_dnerf_fixture
    from cednerf_tpu.datasets.dnerf_synthetic import DNeRFSyntheticDataset
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        make_dnerf_fixture(root)
        ds = DNeRFSyntheticDataset("lego", root, "train", num_rays=16)
        data, sample = dnerf_device_data(ds)
        batch = sample(data, jax.random.PRNGKey(0), 16)
        assert batch["origins"].shape == (16, 3)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(batch["viewdirs"]), axis=-1), 1.0, atol=1e-5)
        # cross-check one specific pixel against the host path
        x = jnp.zeros(4) + 3
        y = jnp.zeros(4) + 5
        from cednerf_tpu.engine.sampling import pinhole_rays_device
        o_dev, d_dev = pinhole_rays_device(x, y, data["K"],
                                           data["camtoworlds"][jnp.zeros(4, int)],
                                           True)
        from cednerf_tpu.datasets.rays import pinhole_rays
        o_host, d_host, _ = pinhole_rays(
            np.full(4, 3.0, np.float32), np.full(4, 5.0, np.float32), ds.K,
            np.broadcast_to(ds.camtoworlds[0], (4, 3, 4)), True)
        np.testing.assert_allclose(np.asarray(o_dev), o_host, atol=1e-5)
        np.testing.assert_allclose(np.asarray(d_dev), d_host, atol=1e-5)


def test_steady_march_shrink_from_full():
    """Shrink-from-full inversion (PERF_PLAN s25 / VERDICT r3 next #4):
    with steady_march_steps unset, the Trainer starts at the FULL lattice
    (no truncation transient) and, once steady-state complete_frac holds,
    shrinks to the measured occupied span + coarse-probe margin. Quality
    telemetry must stay complete throughout."""
    cfg = dataclasses.replace(tiny_cfg(), max_march_steps=512,
                              target_sample_batch_size=16384)
    assert cfg.steady_march_steps == 0 and cfg.steady_march_auto
    scene = BallScene(wh=32)
    field = tiny_field(cfg)
    trainer = Trainer(field, cfg, ModelFlags(), scene, seed=0,
                      device_sampler=scene.device_sampler(),
                      steps_per_call=8)
    assert trainer.steady_march == 0  # full lattice, skip off
    cfs = []
    for _ in range(16):
        m = trainer.run_chunk()
        cfs.append(m["complete_frac"])
    # the ball's occupied span (~tens of slots) + margin is far below
    # 0.75 * 512, so the shrink must have fired...
    assert 0 < trainer.steady_march < cfg.max_march_steps, trainer.steady_march
    # ...and by construction it never truncates (every steady chunk complete)
    steady = cfs[4:]
    assert min(steady) > 0.99, steady


def test_steady_march_explicit_pins_auto_off():
    """An explicit steady_march_steps keeps the legacy fixed-lattice
    behavior (+ doubling repair): the shrink logic must not re-fire."""
    cfg = dataclasses.replace(tiny_cfg(), steady_march_steps=256,
                              max_march_steps=256,
                              target_sample_batch_size=16384)
    scene = BallScene(wh=32)
    field = tiny_field(cfg)
    trainer = Trainer(field, cfg, ModelFlags(), scene, seed=0,
                      device_sampler=scene.device_sampler(),
                      steps_per_call=8)
    for _ in range(8):
        trainer.run_chunk()
    assert trainer.steady_march == 256
