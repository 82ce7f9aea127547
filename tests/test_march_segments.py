"""Two-stage segment marching (renderer.march_segments) must select exactly
the same samples as the dense candidate-lattice path: the coarse segment test
is a conservative superset (pooled + dilated occupancy), so with ample
budget/overcommit nothing may be dropped, in the same ray-major order."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from cednerf_tpu.engine.config import ModelFlags, dnerf_config
from cednerf_tpu.engine.renderer import (march_segments, pack_budget_samples,
                                         render_packed)
from cednerf_tpu.ops.occupancy import (create_occ_grid, march_candidates,
                                       pooled_binaries)

from synthetic_scene import BallScene


def _random_occ(key, res=32, frac=0.05, aabb=(-1.5, -1.5, -1.5, 1.5, 1.5, 1.5)):
    occ = create_occ_grid(aabb, res, 1)
    bits = jax.random.uniform(key, (1, res, res, res)) < frac
    return occ._replace(binaries=bits)


def _rays(key, n=256):
    ko, kd = jax.random.split(key)
    o = jax.random.uniform(ko, (n, 3), minval=-0.3, maxval=0.3)
    d = jax.random.normal(kd, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def _march_args(cfg):
    return dict(near_plane=cfg.near_plane, far_plane=cfg.far_plane,
                render_step_size=cfg.render_step_size,
                cone_angle=cfg.cone_angle,
                max_march_steps=cfg.max_march_steps)


def test_march_segments_matches_dense_lattice():
    cfg = dataclasses.replace(dnerf_config(), max_march_steps=256,
                              render_step_size=2e-2)
    for trial in range(4):
        key = jax.random.PRNGKey(trial)
        k_occ, k_ray, k_strat = jax.random.split(key, 3)
        occ = _random_occ(k_occ, frac=0.03 + 0.05 * trial)
        o, d = _rays(k_ray)
        ts = jnp.full((o.shape[0], 1), 0.5)
        budget = 16384  # ample: no truncation anywhere

        cand = march_candidates(occ, o, d, stratified_key=k_strat,
                                **_march_args(cfg))
        dense = pack_budget_samples(o, d, cand, ts, budget=budget)
        seg = march_segments(occ, o, d, ts, budget=budget, seg=8,
                             overcommit=4.0, pool=4, stratified_key=k_strat,
                             **_march_args(cfg))

        nv = int(jnp.sum(cand.valid))
        assert nv > 100, "scene too empty to be a meaningful test"
        assert bool(jnp.all(dense.complete)) and bool(jnp.all(seg.complete))
        np.testing.assert_array_equal(np.asarray(dense.counts),
                                      np.asarray(seg.counts))
        np.testing.assert_array_equal(np.asarray(dense.starts),
                                      np.asarray(seg.starts))
        # identical samples in identical (ray-major, t-ascending) order
        vd = np.asarray(dense.valid)
        vs = np.asarray(seg.valid)
        assert vd.sum() == vs.sum() == nv
        for f in ("ray", "t_starts", "dts"):
            np.testing.assert_allclose(
                np.asarray(getattr(dense, f))[vd],
                np.asarray(getattr(seg, f))[vs], rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(dense.pos)[vd],
                                   np.asarray(seg.pos)[vs],
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dense.dirs)[vd],
                                   np.asarray(seg.dirs)[vs], rtol=0, atol=0)


def test_march_segments_overflow_flags_incomplete():
    """Segment-stage truncation must mark affected rays incomplete, and the
    demand estimate must exceed what was admitted."""
    cfg = dataclasses.replace(dnerf_config(), max_march_steps=256,
                              render_step_size=2e-2)
    key = jax.random.PRNGKey(9)
    k_occ, k_ray, k_strat = jax.random.split(key, 3)
    occ = _random_occ(k_occ, frac=0.5)  # dense-ish: high demand
    o, d = _rays(k_ray, n=256)
    ts = jnp.full((256, 1), 0.5)
    seg = march_segments(occ, o, d, ts, budget=2048, seg=8, overcommit=1.2,
                         pool=4, stratified_key=k_strat, **_march_args(cfg))
    assert not bool(jnp.all(seg.complete))
    assert int(seg.n_valid) > int(jnp.sum(seg.valid))


def test_pooled_binaries_superset():
    """Every occupied fine cell's region must be covered by the pooled grid
    with one-cell dilation (the conservative-superset invariant)."""
    occ = _random_occ(jax.random.PRNGKey(1), res=32, frac=0.02)
    coarse = np.asarray(pooled_binaries(occ, pool=4, dilate=1)[0])
    fine = np.asarray(occ.binaries[0])
    idx = np.argwhere(fine)
    for ix, iy, iz in idx[:200]:
        cx, cy, cz = ix // 4, iy // 4, iz // 4
        assert coarse[cx, cy, cz]
        # dilation: the full 3^3 neighborhood is set too
        lo = np.maximum([cx - 1, cy - 1, cz - 1], 0)
        hi = np.minimum([cx + 2, cy + 2, cz + 2], coarse.shape[0])
        assert coarse[lo[0]:hi[0], lo[1]:hi[1], lo[2]:hi[2]].all()


def test_train_loop_with_segment_marching():
    """End-to-end: the scanned steady loop trains with march_seg on, stays
    finite, and keeps complete_frac ~1 at adequate budget."""
    from cednerf_tpu.engine.train import Trainer

    cfg = dataclasses.replace(
        dnerf_config(max_steps=64), target_sample_batch_size=4096,
        grid_resolution=16, render_step_size=2e-2, max_march_steps=128,
        occ_warmup_steps=8, occ_update_interval=4, march_seg=8,
        seg_overcommit=2.0)
    from cednerf_tpu.engine.cli import build_field

    flags = ModelFlags(use_div_offsets=True, use_time_embedding=True)
    field = dataclasses.replace(build_field(cfg, flags), dst_resolution=64,
                                n_levels=2, log2_hashmap_size=12)
    scene = BallScene(n_cams=4, wh=32, n_times=4)
    tr = Trainer(field, cfg, flags, scene, seed=0,
                 device_sampler=scene.device_sampler(), steps_per_call=8)
    last = None
    for _ in range(6):
        last = tr.run_chunk()
        assert np.isfinite(last["loss"]), last
    assert last["complete_frac"] > 0.95, last
    assert last["psnr"] > 10.0, last
