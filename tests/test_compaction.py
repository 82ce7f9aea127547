"""Budgeted field evaluation (compact_budget): march packs each ray's valid
samples into its leading slots, so the budget is implemented as a sample-axis
truncation. It must match the dense path when the truncation keeps every
valid sample, and degrade gracefully (per-ray deepest-sample drop) when not."""

import numpy as np
import jax
import jax.numpy as jnp

from cednerf_tpu.engine.renderer import render_rays
from cednerf_tpu.models.field import DNGPRadianceField
from cednerf_tpu.ops.occupancy import RaySamples


def _setup(seed=0, r=8, s=16):
    field = DNGPRadianceField(
        aabb=(-1.5,) * 3 + (1.5,) * 3, n_levels=3, dst_resolution=32,
        base_resolution=8, log2_hashmap_size=10, use_feat_predict=True,
        use_weight_predict=True,
    )
    x = jnp.zeros((4, 3))
    params = field.init(jax.random.PRNGKey(seed), x, jnp.zeros((4, 1)),
                        jnp.ones((4, 3)), return_internal=True)
    rng = np.random.default_rng(seed)
    origins = jnp.asarray(rng.normal(0, 0.1, (r, 3)), jnp.float32)
    viewdirs = jnp.asarray(rng.normal(size=(r, 3)), jnp.float32)
    viewdirs = viewdirs / jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
    t0 = jnp.asarray(np.cumsum(rng.uniform(0.01, 0.05, (r, s)), 1), jnp.float32)
    t1 = t0 + 0.02
    # front-packed validity, the march_rays output contract
    counts = rng.integers(3, s - 2, size=r)
    mask = jnp.asarray(np.arange(s)[None, :] < counts[:, None])
    samples = RaySamples(t_starts=t0, t_ends=t1, mask=mask)
    ts = jnp.full((r, 1), 0.5)
    bkgd = jnp.asarray([1.0, 1.0, 1.0])
    return field, params, origins, viewdirs, samples, ts, bkgd


def test_budgeted_matches_dense_when_budget_sufficient():
    field, params, o, d, samples, ts, bkgd = _setup()
    dense = render_rays(field, params, o, d, samples, ts, bkgd, train=True)
    max_per_ray = int(samples.mask.sum(-1).max())
    budget = 8 * max_per_ray  # truncation keeps every valid sample
    assert budget < 8 * 16
    compact = render_rays(field, params, o, d, samples, ts, bkgd, train=True,
                          compact_budget=budget)
    np.testing.assert_allclose(np.asarray(compact.rgb), np.asarray(dense.rgb),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(compact.depth), np.asarray(dense.depth),
                               rtol=1e-4, atol=1e-5)
    assert int(compact.n_samples) == int(dense.n_samples)
    np.testing.assert_allclose(np.asarray(compact.extras["latent_losses"]),
                               np.asarray(dense.extras["latent_losses"]),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(compact.extras["weight_losses"]),
                               np.asarray(dense.extras["weight_losses"]),
                               rtol=1e-3, atol=1e-5)


def test_budgeted_gradients_match_dense():
    field, params, o, d, samples, ts, bkgd = _setup(seed=1)
    target = jnp.full((8, 3), 0.5)
    max_per_ray = int(samples.mask.sum(-1).max())

    def loss(p, budget):
        out = render_rays(field, p, o, d, samples, ts, bkgd, train=True,
                          compact_budget=budget)
        return jnp.mean((out.rgb - target) ** 2) + jnp.mean(out.extras["latent_losses"])

    g_dense = jax.grad(lambda p: loss(p, None))(params)
    g_comp = jax.grad(lambda p: loss(p, 8 * max_per_ray))(params)
    # bf16 compute differs in rounding between the two batch shapes; require
    # agreement to bf16-level precision only
    for a, b in zip(jax.tree_util.tree_leaves(g_comp),
                    jax.tree_util.tree_leaves(g_dense)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-2,
                                   atol=1e-4)


def test_overflow_drops_deepest_samples_but_stays_finite():
    field, params, o, d, samples, ts, bkgd = _setup(seed=2)
    n_valid = int(samples.mask.sum())
    small = max(8, n_valid // 2)
    out = render_rays(field, params, o, d, samples, ts, bkgd, train=True,
                      compact_budget=small)
    # per-ray cap: each ray keeps at most ceil(small / r) samples
    s_eval = -(-small // 8)
    assert int(out.n_samples) == int(np.minimum(
        np.asarray(samples.mask.sum(-1)), s_eval).sum())
    assert np.isfinite(np.asarray(out.rgb)).all()
