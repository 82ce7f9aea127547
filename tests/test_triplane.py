"""Tri-plane encoder tests: scale schedule, encoding vs a naive per-point
reimplementation of the Taichi kernel math (triplane.py:61-132), product
feature, boundary clamping, and gradient flow to the plane tables."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from cednerf_tpu.ops.triplane import TriPlaneSpec, triplane_encode

PLANE_AXES = ((1, 2), (0, 2), (0, 1))


def naive_encode(x, planes, spec):
    """Straight-line per-point transcription of the reference kernel math,
    with the (documented) clamp of the upsampled index to R-1."""
    r = spec.plane_res
    f = spec.n_features
    scales = spec.scales
    out = np.zeros((x.shape[0], spec.output_dim), np.float64)
    planes = np.asarray(planes, np.float64)
    for n in range(x.shape[0]):
        for lvl in range(spec.n_levels):
            scale = float(scales[lvl])
            pos = x[n] * (scale - 1.0) + 0.5
            pg = np.floor(pos).astype(np.int64)
            frac = pos - pg
            feats = np.zeros((3, f))
            for p, (a, b) in enumerate(PLANE_AXES):
                for c in range(4):
                    da, db = c & 1, (c >> 1) & 1
                    w = (frac[a] if da else 1 - frac[a]) * (
                        frac[b] if db else 1 - frac[b])
                    ia = min(int((pg[a] + da) / scale * r), r - 1)
                    ib = min(int((pg[b] + db) / scale * r), r - 1)
                    feats[p] += w * planes[p * r * r + ia + ib * r]
            lo = lvl * 4 * f
            out[n, lo:lo + 3 * f] = feats.reshape(-1)
            out[n, lo + 3 * f:lo + 4 * f] = feats[0] * feats[1] * feats[2]
    return out


def test_scale_schedule_matches_reference_formula():
    spec = TriPlaneSpec()
    b = math.exp(math.log(4096 / 16) / 7)
    expect = [int(math.ceil(16 * math.exp(i * math.log(b)) - 1.0)) + 1
              for i in range(8)]
    assert spec.scales.tolist() == [float(v) for v in expect]
    assert spec.output_dim == 64


def test_encode_matches_naive():
    spec = TriPlaneSpec(n_levels=4, n_features=2, plane_res=64, base_res=4)
    key = jax.random.PRNGKey(0)
    # fp32 compute so the comparison isn't dominated by bf16 rounding
    planes = jax.random.normal(key, (spec.total_rows, spec.n_features)) * 0.1
    x = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))
    got = triplane_encode(x, planes, spec, compute_dtype=jnp.float32)
    want = naive_encode(np.asarray(x), np.asarray(planes), spec)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_boundary_positions_in_range():
    """x on the unit-cube corners must not read out of bounds (the reference
    kernel's upsampled +1 corner reaches row R — we clamp)."""
    spec = TriPlaneSpec(n_levels=3, n_features=1, plane_res=16, base_res=4)
    planes = jnp.ones((spec.total_rows, 1))
    x = jnp.asarray([[0.0, 0, 0], [1, 1, 1], [1, 0, 1]])
    out = triplane_encode(x, planes, spec, compute_dtype=jnp.float32)
    assert bool(jnp.all(jnp.isfinite(out)))
    # constant table -> every plane feature interpolates to exactly 1
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_gradients_flow_to_planes():
    spec = TriPlaneSpec(n_levels=2, n_features=2, plane_res=32, base_res=4)
    planes = spec.init_planes(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))

    def loss(p):
        return jnp.sum(triplane_encode(x, p, spec, compute_dtype=jnp.float32) ** 2)

    g = jax.grad(loss)(planes)
    assert g.shape == planes.shape
    assert float(jnp.sum(jnp.abs(g))) > 0.0
