"""Hash-grid tests: table sizing schedule, index math vs a naive per-point
implementation (re-derived from the Taichi spec, hash_encoder_half.py:66-103),
interpolation identities, and gradient flow."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from cednerf_tpu.ops.hash_grid import (
    HashGridSpec,
    hash_encode,
    hash_encode_4d,
    level_resolution,
    level_scale,
)

PRIMES = (1, 2654435761, 805459861)


def naive_rows_and_weights(x, spec):
    """Straight-line per-point reimplementation of the hash index math."""
    rows = np.zeros((x.shape[0], spec.n_levels, 8), np.int64)
    weights = np.zeros((x.shape[0], spec.n_levels, 8), np.float64)
    res = spec.resolutions
    sizes = spec.sizes
    offsets = spec.offsets
    for n in range(x.shape[0]):
        for lvl in range(spec.n_levels):
            scale = level_scale(lvl, spec.log_b, spec.base_res)
            pos = x[n] * scale + 0.5
            pg = np.floor(pos).astype(np.int64)
            frac = pos - pg
            for c in range(8):
                w = 1.0
                coord = np.zeros(3, np.uint64)
                for d in range(3):
                    if (c >> d) & 1:
                        coord[d] = pg[d] + 1
                        w *= frac[d]
                    else:
                        coord[d] = pg[d]
                        w *= 1 - frac[d]
                if lvl < spec.begin_fast_hash_level:
                    idx = int(coord[0] + coord[1] * res[lvl] + coord[2] * res[lvl] ** 2)
                else:
                    idx = 0
                    for d in range(3):
                        idx ^= (int(coord[d]) * PRIMES[d]) & 0xFFFFFFFF
                rows[n, lvl, c] = idx % sizes[lvl] + offsets[lvl]
                weights[n, lvl, c] = w
    return rows, weights


def test_sizing_schedule_matches_reference_formulas():
    """16 levels, base 16 -> max 4096, cap 2^19 (the model defaults)."""
    spec = HashGridSpec(n_levels=16, base_res=16, max_res=4096, log2_hashmap_size=19)
    assert spec.log_b == math.log(4096 / 16) / 15
    res = spec.resolutions
    assert res[0] == 16 and res[-1] == 4096
    # dense until res^3 > 2^19 (= 524288): 16^3, 23^3... res<=80
    for lvl, r in enumerate(res):
        full = int(r) ** 3
        expected = min(2 ** 19, ((full + 7) // 8) * 8)
        assert spec.sizes[lvl] == expected
        if full > expected:
            assert lvl >= spec.begin_fast_hash_level
    assert spec.offsets[0] == 0
    assert spec.total_rows == spec.sizes.sum()
    # begin_fast_hash_level: first level whose aligned dense size exceeds cap
    lvl_first = next(i for i, r in enumerate(res) if int(r) ** 3 > 2 ** 19)
    assert spec.begin_fast_hash_level == lvl_first


def test_resolution_formula():
    # res = ceil(base*exp(l*b) - 1) + 1 (hash_encoder_half.py:15-25)
    spec = HashGridSpec(n_levels=16, base_res=16, max_res=4096, log2_hashmap_size=19)
    for lvl in range(16):
        assert spec.resolutions[lvl] == level_resolution(level_scale(lvl, spec.log_b, 16))


def test_encode_matches_naive():
    spec = HashGridSpec(n_levels=4, base_res=4, max_res=64, log2_hashmap_size=8)
    rng = np.random.default_rng(2)
    x = rng.uniform(0.01, 0.99, (8, 3)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    table = np.asarray(spec.init_table(key))

    rows, weights = naive_rows_and_weights(x.astype(np.float64), spec)
    want = (table[rows] * weights[..., None]).sum(axis=2).reshape(8, -1)

    got = np.asarray(
        hash_encode(jnp.asarray(x), jnp.asarray(table), spec, compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_encode_grid_point_returns_table_value():
    """At an exact lattice point of level 0, trilinear weights collapse to one
    corner — the output equals that row of the table."""
    spec = HashGridSpec(n_levels=1, base_res=4, max_res=4, log2_hashmap_size=10)
    table = jnp.arange(spec.total_rows * 2, dtype=jnp.float32).reshape(-1, 2)
    # scale = base - 1 = 3. pick x with x*3 + 0.5 integral: x = 0.5 -> pos 2.0
    x = jnp.asarray([[0.5, 0.5, 0.5]])
    out = np.asarray(hash_encode(x, table, spec, compute_dtype=jnp.float32))
    res = int(spec.resolutions[0])
    idx = 2 + 2 * res + 2 * res * res
    np.testing.assert_allclose(out[0], np.asarray(table[idx]), atol=1e-5)


def test_gradients_flow_to_table():
    spec = HashGridSpec(n_levels=2, base_res=4, max_res=16, log2_hashmap_size=6)
    key = jax.random.PRNGKey(1)
    table = spec.init_table(key)
    x = jax.random.uniform(jax.random.PRNGKey(2), (16, 3), minval=0.05, maxval=0.95)

    def loss(tbl):
        return jnp.sum(hash_encode(x, tbl, spec, compute_dtype=jnp.float32) ** 2)

    g = jax.grad(loss)(table)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_gradients_flow_to_position():
    """Input-position gradients (the Taichi fwd kernel supports them via the
    dw_dpos trick, hash_encoder_half.py:196-220) come for free from autodiff."""
    spec = HashGridSpec(n_levels=2, base_res=4, max_res=16, log2_hashmap_size=6)
    table = spec.init_table(jax.random.PRNGKey(1))
    x = jnp.asarray([[0.33, 0.41, 0.52]])

    def loss(xx):
        return jnp.sum(hash_encode(xx, table, spec, compute_dtype=jnp.float32))

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_4d_keyframe_interpolation():
    """t=0 uses keyframe 0 only; t=1 uses the last; midpoints lerp."""
    spec = HashGridSpec(n_levels=2, base_res=4, max_res=16, log2_hashmap_size=6,
                        time_keyframes=4)
    assert spec.row_features == 8
    key = jax.random.PRNGKey(3)
    table = spec.init_table(key)
    x = jax.random.uniform(jax.random.PRNGKey(4), (6, 3), minval=0.05, maxval=0.95)

    def enc(tv):
        t = jnp.full((6, 1), tv)
        return np.asarray(hash_encode_4d(x, t, table, spec, compute_dtype=jnp.float32))

    table_np = np.asarray(table)

    def enc_with_slice(k):
        sliced = jnp.asarray(np.tile(table_np[:, 2 * k:2 * k + 2], (1, 4)))
        t = jnp.full((6, 1), 0.0)
        return np.asarray(hash_encode_4d(x, t, sliced, spec, compute_dtype=jnp.float32))

    np.testing.assert_allclose(enc(0.0), enc_with_slice(0), atol=1e-5)
    np.testing.assert_allclose(enc(1.0), enc_with_slice(3), atol=1e-5)
    # continuity fix: t=1 equals the limit from below
    np.testing.assert_allclose(enc(1.0), enc(1.0 - 1e-6), atol=1e-4)
    # midpoint of keyframes 0 and 1 at t = 1/6
    mid = 0.5 * (enc_with_slice(0) + enc_with_slice(1))
    np.testing.assert_allclose(enc(1.0 / 6.0), mid, atol=1e-4)
