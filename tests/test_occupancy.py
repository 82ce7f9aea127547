"""Occupancy grid + masked marching tests."""

import numpy as np
import jax
import jax.numpy as jnp

from cednerf_tpu.ops.occupancy import (
    OccGridState,
    create_occ_grid,
    mark_invisible_cells,
    march_rays,
    occupancy_lookup,
    ray_aabb_intersect,
    update_occ_grid,
)


def test_create_grid_nested_aabbs():
    state = create_occ_grid([-1, -1, -1, 1, 1, 1], resolution=16, levels=3)
    aabbs = np.asarray(state.aabbs)
    np.testing.assert_allclose(aabbs[0], [-1, -1, -1, 1, 1, 1])
    np.testing.assert_allclose(aabbs[1], [-2, -2, -2, 2, 2, 2])
    np.testing.assert_allclose(aabbs[2], [-4, -4, -4, 4, 4, 4])
    assert not bool(jnp.any(state.binaries))


def test_ray_aabb_intersect():
    aabb = jnp.asarray([-1.0, -1, -1, 1, 1, 1])
    o = jnp.asarray([[0.0, 0, -3], [0, 0, -3], [5, 5, -3]])
    d = jnp.asarray([[0.0, 0, 1], [0, 0, -1], [0, 0, 1]])
    tmin, tmax = ray_aabb_intersect(o, d, aabb)
    np.testing.assert_allclose(np.asarray(tmin)[0], 2.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(tmax)[0], 4.0, atol=1e-5)
    assert np.asarray(tmin)[1] > np.asarray(tmax)[1]  # pointing away: miss
    assert np.asarray(tmin)[2] > np.asarray(tmax)[2]  # parallel offset: miss


def _density_ball(x, key=None):
    """Density 50 inside a sphere of radius 0.5, else 0 — times step 5e-3."""
    inside = jnp.linalg.norm(x, axis=-1, keepdims=True) < 0.5
    return jnp.where(inside, 50.0, 0.0) * 5e-3


def test_update_marks_dense_region_occupied():
    state = create_occ_grid([-1, -1, -1, 1, 1, 1], resolution=32, levels=1)
    state = update_occ_grid(state, _density_ball, jax.random.PRNGKey(0), all_cells=True)
    # center cell occupied, corner cell not
    assert bool(occupancy_lookup(state, jnp.asarray([[0.0, 0, 0]]))[0])
    assert not bool(occupancy_lookup(state, jnp.asarray([[0.9, 0.9, 0.9]]))[0])
    # EMA: a second update with zero density decays but keeps occupancy
    state2 = update_occ_grid(state, lambda x, k: jnp.zeros((x.shape[0], 1)),
                             jax.random.PRNGKey(1), all_cells=True)
    occ_before = float(jnp.max(state.occs))
    occ_after = float(jnp.max(state2.occs))
    np.testing.assert_allclose(occ_after, occ_before * 0.95, rtol=1e-5)


def test_update_sampled_cells_only_touches_sampled():
    state = create_occ_grid([-1, -1, -1, 1, 1, 1], resolution=16, levels=2)
    state = update_occ_grid(state, _density_ball, jax.random.PRNGKey(0),
                            all_cells=False, sample_fraction=0.25)
    # roughly a quarter of center-region cells got values; grid not all-on
    frac_occupied = float(jnp.mean(state.binaries.astype(jnp.float32)))
    assert 0.0 < frac_occupied < 0.5


def test_march_skips_empty_space():
    state = create_occ_grid([-1, -1, -1, 1, 1, 1], resolution=32, levels=1)
    state = update_occ_grid(state, _density_ball, jax.random.PRNGKey(0), all_cells=True)
    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    samples = march_rays(
        state, o, d, near_plane=0.0, far_plane=1e10, render_step_size=5e-3,
        max_march_steps=512, s_max=256,
    )
    mask = np.asarray(samples.mask)[0]
    t0 = np.asarray(samples.t_starts)[0]
    assert mask.any()
    mids = (t0[mask] + np.asarray(samples.t_ends)[0][mask]) / 2
    # all valid samples near the occupied ball: |z| = |t - 3| <~ 0.5 + cell slack
    assert (np.abs(mids - 3.0) < 0.6).all()
    # compaction: valid samples are contiguous from slot 0 and t-ordered
    first_invalid = mask.argmin() if (~mask).any() else len(mask)
    assert mask[:first_invalid].all() and not mask[first_invalid:].any()
    assert (np.diff(mids) > 0).all()


def test_march_miss_gives_empty():
    state = create_occ_grid([-1, -1, -1, 1, 1, 1], resolution=16, levels=1)
    state = state._replace(binaries=jnp.ones_like(state.binaries))
    o = jnp.asarray([[5.0, 5.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    samples = march_rays(
        state, o, d, near_plane=0.0, far_plane=1e10, render_step_size=1e-2,
        max_march_steps=128, s_max=64,
    )
    assert not bool(samples.mask.any())


def test_march_cone_angle_grows_steps():
    state = create_occ_grid([-2, -2, -2, 2, 2, 2], resolution=8, levels=1)
    state = state._replace(binaries=jnp.ones_like(state.binaries))
    o = jnp.asarray([[0.0, 0.0, -2.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    samples = march_rays(
        state, o, d, near_plane=0.5, far_plane=1e10, render_step_size=1e-3,
        cone_angle=0.01, max_march_steps=256, s_max=256,
    )
    dt = np.asarray(samples.t_ends - samples.t_starts)[0]
    mask = np.asarray(samples.mask)[0]
    dts = dt[mask]
    assert dts[0] >= 1e-3 - 1e-9
    assert dts[-1] > dts[0]  # grew with t
    # growth law dt = max(step, t * cone)
    t0s = np.asarray(samples.t_starts)[0][mask]
    np.testing.assert_allclose(dts, np.maximum(1e-3, t0s * 0.01), rtol=1e-4)


def test_stratified_jitter_changes_samples():
    state = create_occ_grid([-1, -1, -1, 1, 1, 1], resolution=8, levels=1)
    state = state._replace(binaries=jnp.ones_like(state.binaries))
    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    kwargs = dict(near_plane=0.0, far_plane=1e10, render_step_size=1e-2,
                  max_march_steps=64, s_max=32)
    s1 = march_rays(state, o, d, stratified_key=jax.random.PRNGKey(1), **kwargs)
    s2 = march_rays(state, o, d, stratified_key=jax.random.PRNGKey(2), **kwargs)
    assert not np.allclose(np.asarray(s1.t_starts), np.asarray(s2.t_starts))


def test_finest_level_priority():
    """A point inside both levels must be tested against level 0 (finest)."""
    state = create_occ_grid([-1, -1, -1, 1, 1, 1], resolution=4, levels=2)
    # occupy ALL of level 1, nothing in level 0
    binaries = state.binaries.at[1].set(True)
    state = state._replace(binaries=binaries)
    inside_l0 = jnp.asarray([[0.0, 0.0, 0.0]])
    outside_l0 = jnp.asarray([[1.5, 0.0, 0.0]])
    assert not bool(occupancy_lookup(state, inside_l0)[0])
    assert bool(occupancy_lookup(state, outside_l0)[0])


def test_mark_invisible_cells():
    state = create_occ_grid([-1, -1, -1, 1, 1, 1], resolution=8, levels=1)
    # one camera at z=-3 looking +z with a narrow fov (half-angle ~9.5deg:
    # sees |x| < ~0.35 at z=2, so corner cells fall outside the frustum)
    K = np.asarray([[300.0, 0, 50], [0, 300.0, 50], [0, 0, 1]])
    c2w = np.asarray([[[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -3.0]]])
    state2 = mark_invisible_cells(state, K, c2w, width=100, height=100)
    occs = np.asarray(state2.occs)
    assert (occs == -1).any() and (occs == 0).any()
    # invisible cells never binarize even after a huge density update
    state3 = update_occ_grid(state2, lambda x, k: jnp.full((x.shape[0], 1), 100.0),
                             jax.random.PRNGKey(0), all_cells=True)
    bin_flat = np.asarray(state3.binaries).reshape(-1)
    assert not bin_flat[occs[0] == -1].any()


def test_march_candidates_skip_empty_parity():
    """probe_steps>0 lattice == full lattice's valid samples, when covered.

    Empty-space skipping advances each ray's lattice start by whole
    skip_seg*step quanta past provably-empty segments, so the valid sample
    t-positions must match the full lattice's (modulo one f32 rounding)."""
    from cednerf_tpu.ops.occupancy import march_candidates

    state = create_occ_grid([-1, -1, -1, 1, 1, 1], resolution=32, levels=1)
    state = update_occ_grid(state, _density_ball, jax.random.PRNGKey(0),
                            all_cells=True)
    rng = np.random.default_rng(3)
    o = np.zeros((16, 3), np.float32)
    o[:, 2] = -3.0
    o[:, 0] = rng.uniform(-0.3, 0.3, 16)
    d = rng.normal(0, 0.04, (16, 3)).astype(np.float32)
    d[:, 2] += 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    kw = dict(near_plane=0.0, far_plane=1e10, render_step_size=5e-3)
    full = march_candidates(state, jnp.asarray(o), jnp.asarray(d),
                            max_march_steps=1024, **kw)
    skip = march_candidates(state, jnp.asarray(o), jnp.asarray(d),
                            max_march_steps=384, probe_steps=1024, **kw)
    assert full.covered is None and skip.covered is not None
    # ball span ~1.0 = 200 steps, plus the conservative pooled+dilated
    # probe slack (~2 coarse cells = 0.5 units = 100 steps) < 384
    assert bool(jnp.all(skip.covered))
    for r in range(16):
        tf = np.asarray(full.t_starts[r])[np.asarray(full.valid[r])]
        ts = np.asarray(skip.t_starts[r])[np.asarray(skip.valid[r])]
        assert len(tf) > 0 and len(tf) == len(ts), (r, len(tf), len(ts))
        np.testing.assert_allclose(ts, tf, atol=1e-5)


def test_march_candidates_skip_flags_uncovered():
    """A ray whose occupied span exceeds the shrunken lattice -> covered=0."""
    from cednerf_tpu.ops.occupancy import march_candidates

    state = create_occ_grid([-1, -1, -1, 1, 1, 1], resolution=32, levels=1)
    # occupy everything: span = full AABB traversal (2.0 / 5e-3 = 400 steps)
    state = state._replace(binaries=jnp.ones_like(state.binaries))
    o = jnp.asarray([[0.0, 0.0, -3.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    kw = dict(near_plane=0.0, far_plane=1e10, render_step_size=5e-3)
    skip = march_candidates(state, o, d, max_march_steps=128,
                            probe_steps=1024, **kw)
    assert not bool(skip.covered[0])
    # and a miss ray is covered (nothing to sample)
    skip2 = march_candidates(state, jnp.asarray([[5.0, 5.0, -3.0]]), d,
                             max_march_steps=128, probe_steps=1024, **kw)
    assert bool(skip2.covered[0]) and not bool(skip2.valid.any())
