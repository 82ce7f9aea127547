"""Interpret-mode correctness gates for ops/pallas_encoder.py.

Every kernel is checked against the brick-grid XLA reference math
(ops/brick_grid.py) in float32, where the two paths must agree to float
noise. The end-to-end test additionally asserts gradient equality of
`brick_encode` under scatter_impl="fused" vs "xla".
"""

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from cednerf_tpu.ops import brick_grid as bg
from cednerf_tpu.ops import pallas_encoder as pe

F = 4
N = 512


def _setup(seed=0):
    spec = bg.BrickGridSpec(
        n_levels=4, n_features=F, base_res=16, max_res=128,
        log2_hashmap_size=14, max_table_rows=2048)
    layouts = spec.level_layout()
    params = spec.init_params(jr.PRNGKey(seed))
    x = jr.uniform(jr.PRNGKey(seed + 1), (N, 3))
    scales = [bg.level_scale(l, spec.log_b, spec.base_res)
              for l in range(spec.n_levels)]
    nbs = [lay["n_bricks_axis"] for lay in layouts]
    feats_list, rows_list, outs = [], [], []
    for lvl, lay in enumerate(layouts):
        if lay["hashed"]:
            table = params[f"bricks_{lvl}"]
        else:
            table = bg._materialize_dense_bricks(
                params[f"grid_{lvl}"], lay["n_bricks_axis"])
        rows, intra, frac, _ = bg._level_geom(
            x, scales[lvl], nbs[lvl], lay["hashed"], lay["rows"])
        feats = jnp.take(table.astype(jnp.float32), rows, axis=0)
        w, _ = bg._axis_factors(intra, frac, jnp.float32)
        wl = bg._w_lanes(w, F)
        outs.append(jnp.dot(feats * wl, bg._feature_selector(F, jnp.float32)))
        feats_list.append(feats)
        rows_list.append(rows)
    return (spec, layouts, params, x, scales, nbs, feats_list, rows_list,
            jnp.concatenate(outs, -1))


def _ref_level_bwd(x, g_lvl, feats, scale, nb, hashed, n_rows):
    """XLA reference backward for one level: (d_table, d_x_partial)."""
    rows, intra, frac, ok3 = bg._level_geom(x, scale, nb, hashed, n_rows)
    w, dw = bg._axis_factors(intra, frac, jnp.float32)
    gout = jnp.tile(g_lvl, (1, bg.CORNERS_PER_BRICK))
    upd = bg._w_lanes(w, F) * gout
    d_table = jnp.zeros((n_rows, 64 * F), jnp.float32).at[rows].add(upd)
    h = feats * gout
    wx, wy, wz = w[:, 0], w[:, 1], w[:, 2]
    dwx, dwy, dwz = dw[:, 0], dw[:, 1], dw[:, 2]

    def lane_dot(ax_, ay_, az_):
        lanes = (ax_[:, :, None, None] * ay_[:, None, :, None]
                 * az_[:, None, None, :])
        lanes = jnp.broadcast_to(
            lanes[..., None], (x.shape[0], 4, 4, 4, F)).reshape(-1, 64 * F)
        return jnp.sum(h * lanes, axis=-1)

    d_frac = jnp.stack([lane_dot(dwx, wy, wz), lane_dot(wx, dwy, wz),
                        lane_dot(wx, wy, dwz)], -1)
    return d_table, d_frac * scale * ok3, upd


def test_interp_fwd_matches_xla():
    (_, _, _, x, scales, nbs, feats_list, _, ref) = _setup()
    got = pe.interp_fwd(x, feats_list, scales, nbs, F,
                        compute_dtype=jnp.float32, tile=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-9)


def test_interp_bwd_matches_xla():
    (_, layouts, _, x, scales, nbs, feats_list, _, _) = _setup()
    g = jr.normal(jr.PRNGKey(7), (N, len(layouts) * F))
    upds, dx = pe.interp_bwd(x, g, feats_list, scales, nbs, F,
                             compute_dtype=jnp.float32, tile=256)
    dx_ref = jnp.zeros((N, 3))
    for lvl, lay in enumerate(layouts):
        _, dxp, upd_ref = _ref_level_bwd(
            x, g[:, lvl * F:(lvl + 1) * F], feats_list[lvl], scales[lvl],
            nbs[lvl], lay["hashed"], lay["rows"])
        np.testing.assert_allclose(np.asarray(upds[lvl]),
                                   np.asarray(upd_ref), atol=1e-5)
        dx_ref = dx_ref + dxp
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("lvl", [0, 3])
def test_interp_bwd_fused_matches_xla(lvl):
    (_, layouts, _, x, scales, nbs, feats_list, rows_list, _) = _setup()
    lay = layouts[lvl]
    g = jr.normal(jr.PRNGKey(9), (N, F))
    d_table_ref, dx_ref, _ = _ref_level_bwd(
        x, g, feats_list[lvl], scales[lvl], nbs[lvl], lay["hashed"],
        lay["rows"])
    dt, dx = pe.interp_bwd_fused(
        x, g, feats_list[lvl], rows_list[lvl], scale=scales[lvl],
        nb=nbs[lvl], n_rows=lay["rows"], n_feat=F,
        compute_dtype=jnp.float32, accum_dtype=jnp.float32,
        tile=256, unroll=4)
    np.testing.assert_allclose(np.asarray(dt), np.asarray(d_table_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-4, atol=1e-7)


def test_brick_encode_fused_scatter_grad_equality():
    """brick_encode grads: scatter_impl='fused' == 'xla' (f32 accum)."""
    spec_x = bg.BrickGridSpec(
        n_levels=4, n_features=F, base_res=16, max_res=128,
        log2_hashmap_size=14, max_table_rows=2048,
        grad_accum_dtype="float32", scatter_impl="xla")
    spec_f = bg.BrickGridSpec(
        n_levels=4, n_features=F, base_res=16, max_res=128,
        log2_hashmap_size=14, max_table_rows=2048,
        grad_accum_dtype="float32", scatter_impl="fused")
    params = spec_x.init_params(jr.PRNGKey(0))
    # 1024-divisible N so the fused path's tile precondition holds
    x = jr.uniform(jr.PRNGKey(1), (1024, 3))

    def loss(spec):
        def f(p, xx):
            out = bg.brick_encode(xx, p, spec, compute_dtype=jnp.float32)
            return jnp.sum(jnp.sin(out * 100.0))
        return f

    (vx, gx), (vf, gf) = (
        jax.value_and_grad(loss(s), argnums=(0, 1))(params, x)
        for s in (spec_x, spec_f))
    np.testing.assert_allclose(float(vx), float(vf), rtol=1e-6)
    # table grads: the two paths sum collision rows in different orders
    # (XLA scatter vs sequential VMEM accumulate), so f32 rounding differs
    # on collision-heavy hashed levels — tolerance covers reorder noise
    for k in gx[0]:
        np.testing.assert_allclose(np.asarray(gx[0][k]),
                                   np.asarray(gf[0][k]),
                                   rtol=1e-3, atol=3e-4, err_msg=k)
    np.testing.assert_allclose(np.asarray(gx[1]), np.asarray(gf[1]),
                               rtol=1e-3, atol=1e-5)


def test_flagship_spec_takes_pallas_route():
    """The production L8F4 spec (16384-row cap, bf16 accum) must satisfy
    the pallas-route preconditions, and the fused bwd must run at a
    16384-row hashed level."""
    spec = bg.BrickGridSpec(
        n_levels=8, n_features=4, base_res=16, max_res=4096,
        log2_hashmap_size=19, max_table_rows=16384,
        grad_accum_dtype="bfloat16", interp_impl="pallas")
    layouts = spec.level_layout()
    assert bg._pallas_route_ok(spec, 2048, layouts)
    lvl = next(i for i, lay in enumerate(layouts) if lay["rows"] == 16384)
    scale = bg.level_scale(lvl, spec.log_b, spec.base_res)
    x = jr.uniform(jr.PRNGKey(0), (2048, 3))
    rows, _, _, _ = bg._level_geom(x, scale, layouts[lvl]["n_bricks_axis"],
                                   True, 16384)
    feats = jr.normal(jr.PRNGKey(1), (2048, 256), jnp.bfloat16)
    g = jr.normal(jr.PRNGKey(2), (2048, 4), jnp.bfloat16)
    dt, dx = pe.interp_bwd_fused(
        x, g, feats, rows, scale=scale, nb=layouts[lvl]["n_bricks_axis"],
        n_rows=16384, n_feat=4, compute_dtype=jnp.bfloat16,
        accum_dtype=jnp.bfloat16)
    assert dt.shape == (16384, 256) and dt.dtype == jnp.bfloat16
    assert dx.shape == (2048, 3) and bool(jnp.all(jnp.isfinite(dx)))


def test_brick_encode_interp_pallas_grad_equality():
    """brick_encode interp_impl='pallas' == 'xla': outputs and all grads."""
    mk = lambda impl: bg.BrickGridSpec(
        n_levels=4, n_features=F, base_res=16, max_res=128,
        log2_hashmap_size=14, max_table_rows=2048,
        grad_accum_dtype="float32", interp_impl=impl)
    params = mk("xla").init_params(jr.PRNGKey(0))
    x = jr.uniform(jr.PRNGKey(1), (1024, 3))

    def loss(spec):
        def f(p, xx):
            out = bg.brick_encode(xx, p, spec, compute_dtype=jnp.float32)
            return jnp.sum(jnp.sin(out * 100.0)), out
        return f

    (vx, ox), gx = jax.value_and_grad(loss(mk("xla")), argnums=(0, 1),
                                      has_aux=True)(params, x)
    (vp, op), gp = jax.value_and_grad(loss(mk("pallas")), argnums=(0, 1),
                                      has_aux=True)(params, x)
    np.testing.assert_allclose(np.asarray(op), np.asarray(ox),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(float(vx), float(vp), rtol=1e-5)
    for k in gx[0]:
        np.testing.assert_allclose(np.asarray(gx[0][k]),
                                   np.asarray(gp[0][k]),
                                   rtol=1e-3, atol=3e-4, err_msg=k)
    np.testing.assert_allclose(np.asarray(gx[1]), np.asarray(gp[1]),
                               rtol=1e-3, atol=1e-5)
