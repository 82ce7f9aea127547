"""Radiance-field model tests: shapes, selector semantics, flags, gradients."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cednerf_tpu.models.field import DNGPRadianceField, NGPDensityField, contract_to_unisphere

AABB = (-1.5, -1.5, -1.5, 1.5, 1.5, 1.5)


def small_field(**kw):
    defaults = dict(
        aabb=AABB, n_levels=4, dst_resolution=64, log2_hashmap_size=10,
        base_resolution=4,
    )
    defaults.update(kw)
    return DNGPRadianceField(**defaults)


def init_field(field, seed=0):
    x = jnp.zeros((4, 3))
    t = jnp.zeros((4, 1))
    d = jnp.ones((4, 3))
    # return_internal=True traces the aux prediction heads so their params
    # exist (they are only used in training).
    return field.init(jax.random.PRNGKey(seed), x, t, d, return_internal=True)


def test_forward_shapes():
    field = small_field()
    params = init_field(field)
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1, maxval=1)
    t = jnp.full((32, 1), 0.5)
    d = jax.random.normal(jax.random.PRNGKey(2), (32, 3))
    rgb, res = field.apply(params, x, t, d)
    assert rgb.shape == (32, 3)
    assert res["density"].shape == (32, 1)
    assert res["base_mlp_out"].shape == (32, 15)
    assert (np.asarray(rgb) >= 0).all() and (np.asarray(rgb) <= 1).all()
    assert (np.asarray(res["density"]) >= 0).all()


def test_density_zero_outside_aabb():
    field = small_field()
    params = init_field(field)
    x = jnp.asarray([[5.0, 5.0, 5.0], [0.0, 0.0, 0.0]])
    t = jnp.zeros((2, 1))
    res = field.apply(params, x, t, method=field.query_density)
    d = np.asarray(res["density"])
    assert d[0, 0] == 0.0
    assert d[1, 0] > 0.0


def test_skip_move_gives_zero_move():
    field = small_field()
    params = init_field(field)
    x = jnp.zeros((4, 3))
    t = jnp.full((4, 1), 0.7)
    res = field.apply(params, x, t, return_internal=True, skip_move=True,
                      method=field.query_density)
    np.testing.assert_allclose(np.asarray(res["internal"]["move"]), 0.0)


def test_move_is_bounded_by_moving_step():
    field = small_field(use_div_offsets=True, moving_step=1e-3)
    params = init_field(field)
    x = jax.random.uniform(jax.random.PRNGKey(3), (16, 3), minval=-1, maxval=1)
    t = jnp.full((16, 1), 0.3)
    x2, move = field.apply(params, x, t, method=field.query_move)
    np.testing.assert_allclose(np.asarray(x2 - x), np.asarray(move), atol=1e-6)
    # fine part is tanh-bounded; grid part is linear — with init weights ~small,
    # sanity: finite and small
    assert np.abs(np.asarray(move)).max() < 1.0


@pytest.mark.parametrize("inject_before", [True, False])
def test_time_embedding_paths(inject_before):
    field = small_field(
        use_time_embedding=True, use_time_attenuation=True,
        time_inject_before_sigma=inject_before,
    )
    params = init_field(field)
    x = jax.random.uniform(jax.random.PRNGKey(4), (8, 3), minval=-1, maxval=1)
    t = jnp.full((8, 1), 0.25)
    res = field.apply(params, x, t, return_feat=True, method=field.query_density)
    want = 15 if inject_before else 15 + 9  # geo (+ time latent post-sigma)
    assert res["base_mlp_out"].shape == (8, want)
    res2 = field.apply(params, x, jnp.full((8, 1), 0.9), return_feat=True,
                       method=field.query_density)
    if inject_before:
        # time feeds the density MLP -> density changes with t
        assert not np.allclose(np.asarray(res["density"]), np.asarray(res2["density"]),
                               atol=0, rtol=1e-9)
    else:
        # time only reaches the color head via base_mlp_out
        assert not np.allclose(np.asarray(res["base_mlp_out"]),
                               np.asarray(res2["base_mlp_out"]))


def test_internal_aux_heads():
    field = small_field(use_feat_predict=True, use_weight_predict=True)
    params = init_field(field)
    x = jax.random.uniform(jax.random.PRNGKey(5), (8, 3), minval=-1, maxval=1)
    t = jnp.full((8, 1), 0.5)
    res = field.apply(params, x, t, return_internal=True, method=field.query_density)
    internal = res["internal"]
    assert internal["latent_losses"].shape == (8, field.hash_spec.output_dim)
    assert internal["weight_losses"].shape == (8, 1)
    assert (np.asarray(internal["latent_losses"]) >= 0).all()


def test_hash4motion_variant():
    field = small_field(hash4motion=True)
    params = init_field(field)
    x = jax.random.uniform(jax.random.PRNGKey(6), (8, 3), minval=-1, maxval=1)
    t = jnp.full((8, 1), 0.5)
    rgb, res = field.apply(params, x, t, jnp.ones((8, 3)))
    assert rgb.shape == (8, 3)


def test_hash4d_grid_type():
    field = small_field(grid_type="hash4d", time_keyframes=4)
    params = init_field(field)
    x = jax.random.uniform(jax.random.PRNGKey(7), (8, 3), minval=-1, maxval=1)
    rgb0, res0 = field.apply(params, x, jnp.zeros((8, 1)), jnp.ones((8, 3)))
    rgb1, res1 = field.apply(params, x, jnp.ones((8, 1)), jnp.ones((8, 3)))
    assert not np.allclose(np.asarray(res0["density"]), np.asarray(res1["density"]))


def test_triplane_grid_type():
    field = small_field(grid_type="triplane", use_feat_predict=True)
    params = init_field(field)
    planes = params["params"]["hash_encoder"]["planes"]
    assert planes.shape == (3 * 64 * 64, 2)
    x = jax.random.uniform(jax.random.PRNGKey(7), (8, 3), minval=-1, maxval=1)
    rgb, res = field.apply(params, x, jnp.full((8, 1), 0.5), jnp.ones((8, 3)),
                           return_internal=True)
    assert rgb.shape == (8, 3)
    # feat-predict head targets the tri-plane feature width (4 groups/level)
    assert res["internal"]["latent_losses"].shape == (8, field.encoder_output_dim)

    def loss(p):
        rgb, _ = field.apply(p, x, jnp.full((8, 1), 0.5), jnp.ones((8, 3)))
        return jnp.sum(rgb ** 2)

    g = jax.grad(loss)(params)
    g_planes = g["params"]["hash_encoder"]["planes"]
    assert float(jnp.sum(jnp.abs(g_planes))) > 0.0


def test_gradients_flow_everywhere():
    field = small_field(use_feat_predict=True, use_time_embedding=True,
                        use_time_attenuation=True, use_div_offsets=True)
    params = init_field(field)
    x = jax.random.uniform(jax.random.PRNGKey(8), (16, 3), minval=-1, maxval=1)
    t = jnp.full((16, 1), 0.5)
    d = jnp.ones((16, 3))

    def loss(p):
        rgb, res = field.apply(p, x, t, d, return_internal=True)
        return jnp.sum(rgb) + jnp.sum(res["density"]) + jnp.sum(
            res["internal"]["latent_losses"])

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    nonzero = [float(jnp.abs(l).sum()) > 0 for l in leaves]
    assert sum(nonzero) >= len(leaves) - 1  # allow a dead bias at init


def test_density_field():
    field = NGPDensityField(aabb=AABB, max_resolution=32, n_levels=3,
                            log2_hashmap_size=8)
    x = jax.random.uniform(jax.random.PRNGKey(9), (8, 3), minval=-1, maxval=1)
    params = field.init(jax.random.PRNGKey(0), x)
    d = field.apply(params, x)
    assert d.shape == (8, 1)
    assert (np.asarray(d) >= 0).all()


def test_density_field_unbounded():
    field = NGPDensityField(aabb=AABB, unbounded=True, max_resolution=32,
                            n_levels=3, log2_hashmap_size=8)
    x = jnp.asarray([[10.0, 0.0, 0.0]])
    params = field.init(jax.random.PRNGKey(0), x)
    d = field.apply(params, x)
    assert np.isfinite(np.asarray(d)).all()


def test_contract_to_unisphere():
    amin = jnp.asarray([-1.0, -1, -1])
    amax = jnp.asarray([1.0, 1, 1])
    inside = contract_to_unisphere(jnp.asarray([[0.0, 0, 0]]), amin, amax)
    np.testing.assert_allclose(np.asarray(inside), 0.5, atol=1e-6)
    far = contract_to_unisphere(jnp.asarray([[1e6, 0, 0]]), amin, amax)
    assert (np.asarray(far) >= 0).all() and (np.asarray(far) <= 1).all()
    np.testing.assert_allclose(np.asarray(far)[0, 0], 1.0, atol=1e-3)
