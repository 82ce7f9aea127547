"""Brick-layout grid tests: interpolation correctness vs a naive
implementation, dense-level continuity, 4D keyframe lerp, gradients, and
field-level equivalence of capabilities."""

import numpy as np
import jax
import jax.numpy as jnp

from cednerf_tpu.ops.brick_grid import (
    BRICK_CELLS,
    CORNERS_PER_BRICK,
    BrickGridSpec,
    _corner_weights,
    _materialize_dense_bricks,
    brick_encode,
    level_resolution,
    level_scale,
)


def small_spec(**kw):
    d = dict(n_levels=3, n_features=2, base_res=4, max_res=32, log2_hashmap_size=10)
    d.update(kw)
    return BrickGridSpec(**d)


def naive_dense_encode(x, grid, lvl, spec):
    """Direct trilinear interpolation on the canonical dense corner grid."""
    scale = level_scale(lvl, spec.log_b, spec.base_res)
    out = np.zeros((x.shape[0], spec.n_features))
    for n in range(x.shape[0]):
        pos = x[n] * scale + 0.5
        pg = np.floor(pos).astype(int)
        fr = pos - pg
        for c in range(8):
            w = 1.0
            coord = np.zeros(3, int)
            for d in range(3):
                if (c >> d) & 1:
                    coord[d] = pg[d] + 1
                    w *= fr[d]
                else:
                    coord[d] = pg[d]
                    w *= 1 - fr[d]
            out[n] += w * grid[coord[0], coord[1], coord[2]]
    return out


def test_layout_dense_vs_hashed():
    spec = BrickGridSpec(n_levels=16, base_res=16, max_res=4096,
                         log2_hashmap_size=19)
    lays = spec.level_layout()
    # hashed tables are capped to stay VMEM-resident on TPU
    hashed_rows = min(2 ** 19 // 16, spec.max_table_rows)
    for lay in lays:
        if not lay["hashed"]:
            assert lay["n_bricks_axis"] ** 3 <= hashed_rows
        else:
            assert lay["rows"] == hashed_rows
    assert not lays[0]["hashed"] and lays[-1]["hashed"]


def test_corner_weights_sum_to_one():
    rng = np.random.default_rng(0)
    intra = jnp.asarray(rng.integers(0, 3, (32, 3)))
    frac = jnp.asarray(rng.random((32, 3)), jnp.float32)
    w = np.asarray(_corner_weights(intra, frac, jnp.float32))
    assert w.shape == (32, 64)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-5)
    assert (np.sort(w, axis=-1)[:, :-8] == 0).all()  # exactly 8 nonzeros


def test_dense_level_matches_naive_trilinear():
    """Brick encode on a dense level == direct interpolation on the canonical
    grid (exact NGP semantics preserved for dense levels)."""
    spec = small_spec(n_levels=1, base_res=8, max_res=8)
    params = spec.init_params(jax.random.PRNGKey(0))
    (name, shape), = spec.param_shapes()
    assert name == "grid_0"
    grid = np.asarray(params[name])
    rng = np.random.default_rng(1)
    x = rng.uniform(0.02, 0.98, (32, 3)).astype(np.float32)
    got = np.asarray(brick_encode(jnp.asarray(x), params, spec,
                                  compute_dtype=jnp.float32))
    want = naive_dense_encode(x.astype(np.float64), grid, 0, spec)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_dense_level_continuity_across_bricks():
    """The encoding is continuous across brick boundaries at dense levels
    (shared canonical corners — the layout transform does not split them)."""
    spec = small_spec(n_levels=1, base_res=16, max_res=16)
    params = spec.init_params(jax.random.PRNGKey(2))
    scale = level_scale(0, spec.log_b, spec.base_res)
    # brick boundary at cell 3: pos = 3.0 -> x = (3.0 - 0.5) / scale
    xb = (3.0 - 0.5) / scale
    eps = 1e-4
    pts = jnp.asarray([[xb - eps, 0.4, 0.4], [xb + eps, 0.4, 0.4]], jnp.float32)
    out = np.asarray(brick_encode(pts, params, spec, compute_dtype=jnp.float32))
    np.testing.assert_allclose(out[0], out[1], atol=1e-4)


def test_materialize_dense_bricks_shares_corners():
    nb = 3
    n = 3 * nb + 1
    grid = jnp.arange(n ** 3 * 2, dtype=jnp.float32).reshape(n, n, n, 2)
    bricks = np.asarray(_materialize_dense_bricks(grid, nb))
    assert bricks.shape == (27, 128)
    # brick (0,0,0) corner (3,0,0) == brick (1,0,0) corner (0,0,0)
    b000 = bricks[0].reshape(4, 4, 4, 2)
    b100 = bricks[9].reshape(4, 4, 4, 2)  # brick x=1 -> index 1*nb*nb
    np.testing.assert_array_equal(b000[3, 0, 0], b100[0, 0, 0])
    np.testing.assert_array_equal(b000[0, 0, 0], np.asarray(grid[0, 0, 0]))


def test_hashed_level_valid_and_deterministic():
    spec = small_spec(n_levels=2, base_res=16, max_res=64, log2_hashmap_size=8)
    lays = spec.level_layout()
    assert lays[1]["hashed"]
    params = spec.init_params(jax.random.PRNGKey(3))
    x = jax.random.uniform(jax.random.PRNGKey(4), (64, 3), minval=0.01, maxval=0.99)
    a = np.asarray(brick_encode(x, params, spec, compute_dtype=jnp.float32))
    b = np.asarray(brick_encode(x, params, spec, compute_dtype=jnp.float32))
    np.testing.assert_array_equal(a, b)
    assert np.isfinite(a).all()
    assert a.shape == (64, spec.output_dim)


def test_gradients_flow():
    spec = small_spec()
    params = spec.init_params(jax.random.PRNGKey(5))
    x = jax.random.uniform(jax.random.PRNGKey(6), (32, 3), minval=0.05, maxval=0.95)

    def loss(p, xx):
        return jnp.sum(brick_encode(xx, p, spec, compute_dtype=jnp.float32) ** 2)

    g = jax.grad(loss)(params, x)
    for k, v in g.items():
        assert np.isfinite(np.asarray(v)).all(), k
        assert float(jnp.abs(v).sum()) > 0, k
    gx = jax.grad(loss, argnums=1)(params, x)
    assert np.isfinite(np.asarray(gx)).all()


def test_custom_vjp_matches_autodiff():
    """The analytic backward (table + input-position grads) must match pure
    autodiff through the same forward math."""
    spec = small_spec(n_levels=3, base_res=4, max_res=32, log2_hashmap_size=8)
    params = spec.init_params(jax.random.PRNGKey(9))
    x = jax.random.uniform(jax.random.PRNGKey(10), (64, 3),
                           minval=0.05, maxval=0.95)
    g_out = jax.random.normal(jax.random.PRNGKey(11), (64, spec.output_dim))

    def loss(p, xx, custom):
        out = brick_encode(xx, p, spec, compute_dtype=jnp.float32,
                           use_custom_vjp=custom)
        return jnp.sum(out * g_out)

    # forwards identical
    np.testing.assert_allclose(
        np.asarray(loss(params, x, True)), np.asarray(loss(params, x, False)),
        rtol=1e-5)
    gp_c, gx_c = jax.grad(loss, argnums=(0, 1))(params, x, True)
    gp_a, gx_a = jax.grad(loss, argnums=(0, 1))(params, x, False)
    for k in gp_c:
        np.testing.assert_allclose(np.asarray(gp_c[k]), np.asarray(gp_a[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_a),
                               rtol=1e-3, atol=1e-4)


def test_bf16_grad_accum_close_to_f32():
    """grad_accum_dtype='bfloat16' table grads track the f32 accumulation
    within bf16 rounding (the training default; engine/config.py)."""
    import dataclasses as dc

    spec32 = small_spec(n_levels=3, base_res=4, max_res=32,
                        log2_hashmap_size=8)
    spec16 = dc.replace(spec32, grad_accum_dtype="bfloat16")
    params = spec32.init_params(jax.random.PRNGKey(9))
    x = jax.random.uniform(jax.random.PRNGKey(10), (256, 3),
                           minval=0.05, maxval=0.95)
    g_out = jax.random.normal(jax.random.PRNGKey(11), (256, spec32.output_dim))

    def loss(p, sp):
        out = brick_encode(x, p, sp, compute_dtype=jnp.bfloat16)
        return jnp.sum(out.astype(jnp.float32) * g_out)

    g32 = jax.grad(loss)(params, spec32)
    g16 = jax.grad(loss)(params, spec16)
    for k in g32:
        a, b = np.asarray(g32[k], np.float32), np.asarray(g16[k], np.float32)
        scale = np.abs(a).max() + 1e-9
        assert np.abs(a - b).max() / scale < 0.05, k
        assert g16[k].dtype == g32[k].dtype  # params grad dtype unchanged


def test_variant_impls_match_default():
    """The lane-compare ('cmp') backward variant and the fused-all-levels
    encoder must match the default per-level outer-product path: identical
    forwards and table grads, position grads to bf16 reassociation tolerance."""
    from cednerf_tpu.ops.brick_grid import brick_encode_fused

    spec = small_spec(n_levels=4, base_res=4, max_res=64, log2_hashmap_size=8)
    params = spec.init_params(jax.random.PRNGKey(12))
    # include out-of-lattice points to exercise the clamp/ok gating
    x = jax.random.uniform(jax.random.PRNGKey(13), (128, 3),
                           minval=-0.05, maxval=1.05)

    def loss(fn):
        return lambda p, xx: jnp.sum(jnp.sin(fn(xx, p).astype(jnp.float32)))

    ref = loss(lambda xx, p: brick_encode(xx, p, spec))
    for name, fn in [
        ("cmp", loss(lambda xx, p: brick_encode(xx, p, spec, dx_impl="cmp"))),
        ("fused", loss(lambda xx, p: brick_encode_fused(xx, p, spec))),
    ]:
        np.testing.assert_allclose(np.asarray(ref(params, x)),
                                   np.asarray(fn(params, x)), rtol=1e-6,
                                   err_msg=name)
        gp_r, gx_r = jax.grad(ref, argnums=(0, 1))(params, x)
        gp_v, gx_v = jax.grad(fn, argnums=(0, 1))(params, x)
        for k in gp_r:
            np.testing.assert_allclose(np.asarray(gp_r[k]),
                                       np.asarray(gp_v[k]),
                                       rtol=1e-5, atol=1e-7,
                                       err_msg=f"{name}:{k}")
        np.testing.assert_allclose(np.asarray(gx_r), np.asarray(gx_v),
                                   rtol=5e-2, atol=2e-3, err_msg=name)


def test_remat_feats_grads_identical():
    """remat_feats re-gathers the same rows the forward used: bit-identical
    value and gradients vs the residual-saving default, for both the
    per-level path and the Pallas all-levels route."""
    for impl_kw in ({}, {"interp_impl": "pallas", "scatter_impl": "fused"},
                    {"time_keyframes": 4}):
        spec = small_spec(n_levels=4, base_res=4, max_res=64,
                          log2_hashmap_size=8, **impl_kw)
        import dataclasses
        spec_r = dataclasses.replace(spec, remat_feats=True)
        params = spec.init_params(jax.random.PRNGKey(20))
        n = 1024 if "interp_impl" in impl_kw else 128  # pallas needs tiles
        x = jax.random.uniform(jax.random.PRNGKey(21), (n, 3),
                               minval=-0.05, maxval=1.05)
        t = (jax.random.uniform(jax.random.PRNGKey(22), (n, 1))
             if "time_keyframes" in impl_kw else None)

        def loss(sp):
            return lambda p, xx: jnp.sum(
                jnp.sin(brick_encode(xx, p, sp, t=t).astype(jnp.float32)))

        v0, (gp0, gx0) = jax.value_and_grad(loss(spec), argnums=(0, 1))(
            params, x)
        v1, (gp1, gx1) = jax.value_and_grad(loss(spec_r), argnums=(0, 1))(
            params, x)
        assert float(v0) == float(v1), impl_kw
        for k in gp0:
            np.testing.assert_array_equal(np.asarray(gp0[k]),
                                          np.asarray(gp1[k]),
                                          err_msg=f"{impl_kw}:{k}")
        np.testing.assert_array_equal(np.asarray(gx0), np.asarray(gx1),
                                      err_msg=str(impl_kw))


def test_4d_custom_vjp_matches_autodiff():
    """The analytic 4D backward (keyframe-split table grads, position grad,
    time grad) must match pure autodiff through the same forward math."""
    spec = small_spec(n_levels=3, base_res=4, max_res=32, log2_hashmap_size=8,
                      time_keyframes=4)
    params = spec.init_params(jax.random.PRNGKey(20))
    x = jax.random.uniform(jax.random.PRNGKey(21), (64, 3),
                           minval=0.05, maxval=0.95)
    t = jax.random.uniform(jax.random.PRNGKey(22), (64, 1))
    g_out = jax.random.normal(jax.random.PRNGKey(23), (64, spec.output_dim))

    def loss(p, xx, tt, custom):
        out = brick_encode(xx, p, spec, t=tt, compute_dtype=jnp.float32,
                           use_custom_vjp=custom)
        return jnp.sum(out * g_out)

    np.testing.assert_allclose(
        np.asarray(loss(params, x, t, True)),
        np.asarray(loss(params, x, t, False)), rtol=1e-5)
    gp_c, gx_c, gt_c = jax.grad(loss, argnums=(0, 1, 2))(params, x, t, True)
    gp_a, gx_a, gt_a = jax.grad(loss, argnums=(0, 1, 2))(params, x, t, False)
    for key in gp_c:
        np.testing.assert_allclose(np.asarray(gp_c[key]),
                                   np.asarray(gp_a[key]),
                                   rtol=1e-4, atol=1e-6, err_msg=key)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_a),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gt_c), np.asarray(gt_a),
                               rtol=1e-3, atol=1e-4)


def test_4d_keyframe_lerp():
    spec = small_spec(time_keyframes=4)
    params = spec.init_params(jax.random.PRNGKey(7))
    x = jax.random.uniform(jax.random.PRNGKey(8), (16, 3), minval=0.05, maxval=0.95)

    def enc(tv):
        t = jnp.full((16, 1), tv)
        return np.asarray(brick_encode(x, params, spec, t=t,
                                       compute_dtype=jnp.float32))

    e0, e1 = enc(0.0), enc(1.0)
    assert not np.allclose(e0, e1)
    # interior lerp: t=1/6 is midway between keyframes 0 and 1
    mid = enc(1.0 / 6.0)
    third = enc(1.0 / 3.0)
    np.testing.assert_allclose(mid, (enc(0.0) + third) / 2.0, atol=1e-4)
    # continuity at t = 1
    np.testing.assert_allclose(enc(1.0), enc(1.0 - 1e-6), atol=1e-4)


def test_field_with_brick_encoder_trains():
    """DNGPRadianceField(encoder_impl='brick') — forward + grads finite."""
    from cednerf_tpu.models.field import DNGPRadianceField

    field = DNGPRadianceField(
        aabb=(-1.5,) * 3 + (1.5,) * 3, n_levels=4, dst_resolution=64,
        base_resolution=8, log2_hashmap_size=12, encoder_impl="brick",
        use_feat_predict=True,
    )
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1, maxval=1)
    t = jnp.full((32, 1), 0.5)
    d = jnp.ones((32, 3))
    params = field.init(jax.random.PRNGKey(0), x, t, d, return_internal=True)

    def loss(p):
        rgb, res = field.apply(p, x, t, d, return_internal=True)
        return jnp.sum(rgb) + jnp.sum(res["density"])

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_scatter_rows_onehot_xla_matches_scatter():
    """Tiny-dense-table one-hot MXU contraction == .at[].add scatter.

    The xla impl reroutes n_rows <= 512 at bench-scale batches through a
    one-hot dot (f32 accumulation); parity vs the sequential scatter."""
    from cednerf_tpu.ops.brick_grid import _scatter_rows

    rng = np.random.default_rng(0)
    n, n_rows, w = 65536, 216, 32
    rows = jnp.asarray(rng.integers(0, n_rows, n), jnp.int32)
    upd = jnp.asarray(rng.normal(0, 1, (n, w)), jnp.float32)
    out = _scatter_rows(rows, upd, n_rows, jnp.float32, "xla")
    ref = jnp.zeros((n_rows, w), jnp.float32).at[rows].add(upd)
    assert out.shape == (n_rows, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
    # below the batch threshold the exact scatter path is kept
    small = _scatter_rows(rows[:128], upd[:128], n_rows, jnp.float32, "xla")
    ref_s = jnp.zeros((n_rows, w), jnp.float32).at[rows[:128]].add(upd[:128])
    np.testing.assert_array_equal(np.asarray(small), np.asarray(ref_s))


import pytest


@pytest.mark.parametrize("n_features", [4, 8])
def test_cellfused_matches_cell_and_brick(n_features):
    """row_layout='cellfused' (one gather/scatter for ALL hashed levels) is
    bit-compatible with the per-level 'cell' path and matches 'brick' in f32
    (outputs, table grads, position grads), including edge-clamped points."""
    import dataclasses

    spec_b = BrickGridSpec(n_levels=5, n_features=n_features, base_res=8,
                           max_res=256,
                           log2_hashmap_size=12, max_table_rows=512)
    spec_c = dataclasses.replace(spec_b, row_layout="cell")
    spec_f = dataclasses.replace(spec_b, row_layout="cellfused")
    assert sum(l["hashed"] for l in spec_b.level_layout()) >= 2

    rng = np.random.default_rng(7)
    params = {
        name: jnp.asarray(rng.normal(0, 0.1, shape), jnp.float32)
        for name, shape in spec_b.param_shapes()
    }
    # include out-of-box points to exercise the clamp/ok gating of d_x
    x = jnp.asarray(rng.uniform(-0.05, 1.05, (256, 3)), jnp.float32)
    cot = jnp.asarray(rng.normal(0, 1, (256, spec_b.output_dim)), jnp.float32)

    def run(spec):
        def loss(p, xx):
            out = brick_encode(xx, p, spec, compute_dtype=jnp.float32)
            return jnp.sum(out * cot)

        out = brick_encode(x, params, spec, compute_dtype=jnp.float32)
        gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
        return out, gp, gx

    out_b, gp_b, gx_b = run(spec_b)
    out_c, gp_c, gx_c = run(spec_c)
    out_f, gp_f, gx_f = run(spec_f)
    for got, ref, tag in [(out_f, out_c, "out"), (gx_f, gx_c, "gx")]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6, err_msg=tag)
    for k in gp_c:
        np.testing.assert_allclose(np.asarray(gp_f[k]), np.asarray(gp_c[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_b),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_b),
                               rtol=1e-4, atol=1e-5)
    for k in gp_b:
        np.testing.assert_allclose(np.asarray(gp_f[k]), np.asarray(gp_b[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_cellfused_4d_falls_back_to_cell():
    """4D keyframe specs: cellfused routes through the per-level cell path."""
    import dataclasses

    spec_c = BrickGridSpec(n_levels=3, n_features=4, base_res=8, max_res=64,
                           log2_hashmap_size=12, max_table_rows=512,
                           time_keyframes=4, row_layout="cell")
    spec_f = dataclasses.replace(spec_c, row_layout="cellfused")
    rng = np.random.default_rng(3)
    params = {
        name: jnp.asarray(rng.normal(0, 0.1, shape), jnp.float32)
        for name, shape in spec_c.param_shapes()
    }
    x = jnp.asarray(rng.uniform(0.02, 0.98, (64, 3)), jnp.float32)
    t = jnp.asarray(rng.uniform(0.0, 1.0, (64, 1)), jnp.float32)
    out_c = brick_encode(x, params, spec_c, t=t, compute_dtype=jnp.float32)
    out_f = brick_encode(x, params, spec_f, t=t, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out_f), np.asarray(out_c))


@pytest.mark.parametrize("n_features", [4, 8])
def test_cell_row_layout_matches_brick(n_features):
    """row_layout='cell' == 'brick': outputs, table grads, position grads.

    The cell layout gathers one 8-corner row per sample from the expanded
    [rows*27, 8F] table instead of a 64-corner brick row; the other 56
    brick lanes carry zero interpolation weight, so outputs and all
    gradients must match (f32, modulo summation order)."""
    import dataclasses

    spec_b = BrickGridSpec(n_levels=5, n_features=n_features, base_res=8,
                           max_res=256,
                           log2_hashmap_size=12, max_table_rows=512)
    spec_c = dataclasses.replace(spec_b, row_layout="cell")
    lays = spec_b.level_layout()
    assert any(l["hashed"] for l in lays), "need hashed levels for the A/B"

    rng = np.random.default_rng(0)
    params = {
        name: jnp.asarray(rng.normal(0, 0.1, shape), jnp.float32)
        for name, shape in spec_b.param_shapes()
    }
    x = jnp.asarray(rng.uniform(0.02, 0.98, (256, 3)), jnp.float32)
    cot = jnp.asarray(rng.normal(0, 1, (256, spec_b.output_dim)), jnp.float32)

    def run(spec):
        def loss(p, xx):
            out = brick_encode(xx, p, spec, compute_dtype=jnp.float32)
            return jnp.sum(out * cot)

        out = brick_encode(x, params, spec, compute_dtype=jnp.float32)
        gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
        return out, gp, gx

    out_b, gp_b, gx_b = run(spec_b)
    out_c, gp_c, gx_c = run(spec_c)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_b),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_b),
                               rtol=1e-4, atol=1e-5)
    for k in gp_b:
        np.testing.assert_allclose(np.asarray(gp_c[k]), np.asarray(gp_b[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


@pytest.mark.parametrize("n_features", [4, 8])
def test_cellz_row_layout_matches_cell(n_features):
    """row_layout='cellz' == 'cell' == 'brick': outputs and all gradients.

    The z-packed layout gathers one 24F-lane row per sample (the brick's
    full z-column of 3 cells); the two off-cell groups of 8F lanes carry
    zero weight via the lane-constant cell_match factor, so the math is
    identical to the cell layout while running gathers/scatters at the
    measured-efficient v5e row width (96 lanes at F=4)."""
    import dataclasses

    spec_b = BrickGridSpec(n_levels=5, n_features=n_features, base_res=8,
                           max_res=256,
                           log2_hashmap_size=12, max_table_rows=512)
    spec_z = dataclasses.replace(spec_b, row_layout="cellz")
    rng = np.random.default_rng(2)
    params = {
        name: jnp.asarray(rng.normal(0, 0.1, shape), jnp.float32)
        for name, shape in spec_b.param_shapes()
    }
    x = jnp.asarray(rng.uniform(0.02, 0.98, (256, 3)), jnp.float32)
    cot = jnp.asarray(rng.normal(0, 1, (256, spec_b.output_dim)), jnp.float32)

    def run(spec):
        def loss(p, xx):
            out = brick_encode(xx, p, spec, compute_dtype=jnp.float32)
            return jnp.sum(out * cot)

        out = brick_encode(x, params, spec, compute_dtype=jnp.float32)
        gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
        return out, gp, gx

    out_b, gp_b, gx_b = run(spec_b)
    out_z, gp_z, gx_z = run(spec_z)
    np.testing.assert_allclose(np.asarray(out_z), np.asarray(out_b),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx_z), np.asarray(gx_b),
                               rtol=1e-4, atol=1e-5)
    for k in gp_b:
        np.testing.assert_allclose(np.asarray(gp_z[k]), np.asarray(gp_b[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    # remat_feats re-gathers the z-rows in the backward: identical grads
    spec_zr = dataclasses.replace(spec_z, remat_feats=True)
    out_r, gp_r, gx_r = run(spec_zr)
    np.testing.assert_array_equal(np.asarray(out_r), np.asarray(out_z))
    np.testing.assert_array_equal(np.asarray(gx_r), np.asarray(gx_z))
    for k in gp_z:
        np.testing.assert_array_equal(np.asarray(gp_r[k]),
                                      np.asarray(gp_z[k]))


def test_cell_row_layout_matches_brick_4d():
    """4D keyframe path: row_layout='cell' == 'brick' (out + all grads)."""
    import dataclasses

    spec_b = BrickGridSpec(n_levels=4, n_features=4, base_res=8, max_res=128,
                           log2_hashmap_size=12, max_table_rows=512,
                           time_keyframes=4)
    spec_c = dataclasses.replace(spec_b, row_layout="cell")
    rng = np.random.default_rng(1)
    params = {
        name: jnp.asarray(rng.normal(0, 0.1, shape), jnp.float32)
        for name, shape in spec_b.param_shapes()
    }
    x = jnp.asarray(rng.uniform(0.02, 0.98, (128, 3)), jnp.float32)
    t = jnp.asarray(rng.uniform(0.0, 1.0, (128, 1)), jnp.float32)
    cot = jnp.asarray(rng.normal(0, 1, (128, spec_b.output_dim)), jnp.float32)

    def run(spec):
        def loss(p, xx, tt):
            out = brick_encode(xx, p, spec, t=tt, compute_dtype=jnp.float32)
            return jnp.sum(out * cot)

        out = brick_encode(x, params, spec, t=t, compute_dtype=jnp.float32)
        gp, gx, gt = jax.grad(loss, argnums=(0, 1, 2))(params, x, t)
        return out, gp, gx, gt

    out_b, gp_b, gx_b, gt_b = run(spec_b)
    out_c, gp_c, gx_c, gt_c = run(spec_c)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_b),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_b),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gt_c), np.asarray(gt_b),
                               rtol=1e-4, atol=1e-5)
    for kk in gp_b:
        np.testing.assert_allclose(np.asarray(gp_c[kk]), np.asarray(gp_b[kk]),
                                   rtol=1e-4, atol=1e-5, err_msg=kk)


def test_cell_rows_cap_falls_back_to_brick_per_level():
    """Levels whose cell table would exceed cell_rows_cap keep the brick
    layout (the v5e big-table scatter guard) — outputs and grads must
    still match the all-brick run, and a tiny cap must reproduce
    row_layout='brick' exactly (all levels fall back)."""
    import dataclasses

    spec_b = BrickGridSpec(n_levels=5, n_features=4, base_res=8, max_res=256,
                           log2_hashmap_size=12, max_table_rows=512)
    # cap chosen between the levels' cell-table sizes: hashed levels at
    # 512 rows make 13824-row cell tables -> a 14000 cap keeps them on
    # cell; smaller dense-ish hashed levels stay under it either way
    spec_mixed = dataclasses.replace(spec_b, row_layout="cell",
                                     cell_rows_cap=14000)
    spec_allback = dataclasses.replace(spec_b, row_layout="cell",
                                       cell_rows_cap=1)

    rng = np.random.default_rng(3)
    params = {
        name: jnp.asarray(rng.normal(0, 0.1, shape), jnp.float32)
        for name, shape in spec_b.param_shapes()
    }
    x = jnp.asarray(rng.uniform(0.02, 0.98, (256, 3)), jnp.float32)
    cot = jnp.asarray(rng.normal(0, 1, (256, spec_b.output_dim)), jnp.float32)

    def run(spec):
        def loss(p, xx):
            out = brick_encode(xx, p, spec, compute_dtype=jnp.float32)
            return jnp.sum(out * cot)

        out = brick_encode(x, params, spec, compute_dtype=jnp.float32)
        gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
        return out, gp, gx

    out_b, gp_b, gx_b = run(spec_b)
    for spec in (spec_mixed, spec_allback):
        out_m, gp_m, gx_m = run(spec)
        np.testing.assert_allclose(np.asarray(out_m), np.asarray(out_b),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gx_m), np.asarray(gx_b),
                                   rtol=1e-4, atol=1e-5)
        for k in gp_b:
            np.testing.assert_allclose(np.asarray(gp_m[k]),
                                       np.asarray(gp_b[k]),
                                       rtol=1e-4, atol=1e-5, err_msg=k)
    # the cap=1 run must hit the brick path for every level: its jaxpr
    # should contain no 27-cell expansion dot (proxy: identical to brick
    # path timings is unobservable here, so assert via expanded-table
    # absence in the lowered text)
    import jax as _jax

    low = _jax.jit(lambda p, xx: brick_encode(
        xx, p, spec_allback, compute_dtype=jnp.float32)).lower(params, x)
    assert "13824" not in low.as_text()
