"""Multi-pass budgeted eval renderer (engine/renderer.py make_eval_render_fn).

The budgeted path is a resumable marcher (parity target: the reference's
`render_image_test(max_samples=...)` alive-ray loop, cednerf/utils.py:229-308):
per pass it evaluates at most budget_per_ray*C candidates and carries prefix
transmittance. It must match the single-pass dense lattice exactly when early
termination is disabled — for ANY budget (overflow just takes more passes) —
and the s_max cap must genuinely bound per-ray work.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from cednerf_tpu.engine.config import dnerf_config
from cednerf_tpu.engine.renderer import make_eval_render_fn
from cednerf_tpu.models.field import DNGPRadianceField
from cednerf_tpu.ops.occupancy import create_occ_grid


def _setup(seed=0, n_rays=32, alpha_thre=0.0):
    cfg = dataclasses.replace(
        dnerf_config(max_steps=100),
        grid_resolution=8, max_march_steps=64, render_step_size=5e-2,
        eval_s_max=64, alpha_thre=alpha_thre,
    )
    field = DNGPRadianceField(
        aabb=cfg.aabb, n_levels=3, dst_resolution=32, base_resolution=8,
        log2_hashmap_size=10,
    )
    params = field.init(jax.random.PRNGKey(seed), jnp.zeros((4, 3)),
                        jnp.zeros((4, 1)), jnp.ones((4, 3)),
                        return_internal=True)
    occ = create_occ_grid(cfg.aabb, cfg.grid_resolution, cfg.grid_nlvl)
    occ = occ._replace(binaries=jnp.ones_like(occ.binaries))
    rng = np.random.default_rng(seed)
    origins = np.zeros((n_rays, 3), np.float32)
    origins[:, 2] = -3.0
    viewdirs = rng.normal(0, 0.15, (n_rays, 3)).astype(np.float32)
    viewdirs[:, 2] += 1.0
    viewdirs /= np.linalg.norm(viewdirs, axis=-1, keepdims=True)
    bkgd = jnp.asarray([1.0, 1.0, 1.0])
    return cfg, field, params, occ, jnp.asarray(origins), jnp.asarray(viewdirs), bkgd


def _run(fn, params, occ, o, d, bkgd):
    rgb, opac, dep = fn(params, occ, o, d, jnp.float32(0.5), bkgd)
    return np.asarray(rgb), np.asarray(opac), np.asarray(dep)


def test_multipass_matches_dense_small_budget():
    """A tiny per-pass budget (many passes) must reproduce the dense result
    exactly when early termination is off."""
    cfg, field, params, occ, o, d, bkgd = _setup()
    dense = make_eval_render_fn(field, cfg, budgeted=False)
    multi = make_eval_render_fn(field, cfg, budget_per_ray=4,
                                early_stop_eps=-1.0)
    r0 = _run(dense, params, occ, o, d, bkgd)
    r1 = _run(multi, params, occ, o, d, bkgd)
    for a, b in zip(r0, r1):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_multipass_matches_dense_with_alpha_thre():
    cfg, field, params, occ, o, d, bkgd = _setup(seed=3, alpha_thre=1e-3)
    dense = make_eval_render_fn(field, cfg, budgeted=False)
    multi = make_eval_render_fn(field, cfg, budget_per_ray=8,
                                early_stop_eps=-1.0)
    r0 = _run(dense, params, occ, o, d, bkgd)
    r1 = _run(multi, params, occ, o, d, bkgd)
    for a, b in zip(r0, r1):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_early_termination_close_to_exact():
    """Default early-stop threshold changes results by at most ~eps."""
    cfg, field, params, occ, o, d, bkgd = _setup(seed=1)
    exact = make_eval_render_fn(field, cfg, budget_per_ray=8,
                                early_stop_eps=-1.0)
    fast = make_eval_render_fn(field, cfg, budget_per_ray=8,
                               early_stop_eps=1e-4)
    r0 = _run(exact, params, occ, o, d, bkgd)
    r1 = _run(fast, params, occ, o, d, bkgd)
    for a, b in zip(r0, r1):
        np.testing.assert_allclose(a, b, atol=2e-3)


def test_s_max_caps_per_ray_samples():
    """Lowering s_max truncates deep samples: opacity can only decrease, and
    rays with > s_max valid candidates lose contribution."""
    cfg, field, params, occ, o, d, bkgd = _setup(seed=2)
    full = make_eval_render_fn(field, cfg, s_max=64, budget_per_ray=8,
                               early_stop_eps=-1.0)
    capped = make_eval_render_fn(field, cfg, s_max=4, budget_per_ray=8,
                                 early_stop_eps=-1.0)
    _, opac_full, _ = _run(full, params, occ, o, d, bkgd)
    _, opac_cap, _ = _run(capped, params, occ, o, d, bkgd)
    assert (opac_cap <= opac_full + 1e-5).all()
    # this scene marches every ray through >4 occupied cells
    assert opac_cap.sum() < opac_full.sum()


def test_seg_matches_dense_sparse_occupancy():
    """Segment-compacted path vs dense on a SPARSE random grid: the coarse
    segment probe must be a superset (no valid sample may be dropped)."""
    cfg, field, params, occ, o, d, bkgd = _setup(seed=5)
    rng = np.random.default_rng(7)
    bins = rng.random(occ.binaries.shape) < 0.12
    occ = occ._replace(binaries=jnp.asarray(bins))
    dense = make_eval_render_fn(field, cfg, budgeted=False)
    seg = make_eval_render_fn(field, cfg, budget_per_ray=4,
                              early_stop_eps=-1.0, impl="seg")
    r0 = _run(dense, params, occ, o, d, bkgd)
    r1 = _run(seg, params, occ, o, d, bkgd)
    for a, b in zip(r0, r1):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_seg_matches_dense_multilevel():
    """Nested 2-level grid: the 3-probe coarse test must still cover the
    level-boundary segments (exact fine validity catches the rest)."""
    from cednerf_tpu.ops.occupancy import create_occ_grid

    cfg, field, params, occ1, o, d, bkgd = _setup(seed=6)
    occ = create_occ_grid(cfg.aabb, cfg.grid_resolution, levels=2)
    rng = np.random.default_rng(8)
    bins = rng.random(occ.binaries.shape) < 0.15
    occ = occ._replace(binaries=jnp.asarray(bins))
    dense = make_eval_render_fn(field, cfg, budgeted=False)
    seg = make_eval_render_fn(field, cfg, budget_per_ray=8,
                              early_stop_eps=-1.0, impl="seg")
    r0 = _run(dense, params, occ, o, d, bkgd)
    r1 = _run(seg, params, occ, o, d, bkgd)
    for a, b in zip(r0, r1):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_seg_matches_lattice_with_alpha_thre():
    cfg, field, params, occ, o, d, bkgd = _setup(seed=4, alpha_thre=1e-3)
    lat = make_eval_render_fn(field, cfg, budget_per_ray=8,
                              early_stop_eps=-1.0, impl="lattice")
    seg = make_eval_render_fn(field, cfg, budget_per_ray=8,
                              early_stop_eps=-1.0, impl="seg")
    r0 = _run(lat, params, occ, o, d, bkgd)
    r1 = _run(seg, params, occ, o, d, bkgd)
    for a, b in zip(r0, r1):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
