"""Unit tests for parameter-free encoders against naive numpy references
(formulas from cednerf/encoder.py, re-derived independently here)."""

import numpy as np
import jax.numpy as jnp

from cednerf_tpu.ops.encoders import (
    sh_encode_deg2,
    sinusoidal_encode,
    sinusoidal_encode_with_exp,
    sinusoidal_latent_dim,
)


def naive_sinusoidal(x, min_deg, max_deg, use_identity=True):
    scales = np.array([2.0 ** i for i in range(min_deg, max_deg)])
    xb = (x[..., None, :] * scales[:, None]).reshape(*x.shape[:-1], -1)
    latent = np.sin(np.concatenate([xb, xb + 0.5 * np.pi], axis=-1))
    if use_identity:
        latent = np.concatenate([x, latent], axis=-1)
    return latent


def test_sinusoidal_matches_naive():
    rng = np.random.default_rng(0)
    x = rng.uniform(-2, 2, (32, 4)).astype(np.float32)
    got = np.asarray(sinusoidal_encode(jnp.asarray(x), 0, 4))
    want = naive_sinusoidal(x, 0, 4)
    assert got.shape == (32, sinusoidal_latent_dim(4, 0, 4))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sinusoidal_no_identity():
    x = np.linspace(-1, 1, 12, dtype=np.float32).reshape(6, 2)
    got = np.asarray(sinusoidal_encode(jnp.asarray(x), 1, 3, use_identity=False))
    want = naive_sinusoidal(x, 1, 3, use_identity=False)
    assert got.shape == (6, sinusoidal_latent_dim(2, 1, 3, use_identity=False))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sinusoidal_with_exp_zero_var_matches_plain():
    """With zero damping, the WithExp variant equals the plain encoding up to
    the reference's own layout difference: plain groups [all sin | all cos]
    (encoder.py:41) while WithExp interleaves (sin, cos) per degree
    (encoder.py:86-87). For x_dim=1: plain [id, s0..s3, c0..c3], withexp
    [id, s0, c0, s1, c1, ...]."""
    rng = np.random.default_rng(1)
    t = rng.uniform(0, 1, (16, 1)).astype(np.float32)
    zero = jnp.zeros((16, 1))
    got = np.asarray(sinusoidal_encode_with_exp(jnp.asarray(t), zero, 0, 4))
    plain = np.asarray(sinusoidal_encode(jnp.asarray(t), 0, 4))
    perm = [0] + [1 + (i // 2) + 4 * (i % 2) for i in range(8)]
    np.testing.assert_allclose(got, plain[:, perm], atol=1e-6)


def test_sinusoidal_with_exp_damps_high_frequencies():
    """Frequency band i scaled by exp(-x_var * i * 2^i): band 0 undamped,
    higher bands shrink monotonically (cednerf/encoder.py:59-61, :86)."""
    t = jnp.full((4, 1), 0.3)
    var = jnp.full((4, 1), 0.5)
    enc = np.asarray(sinusoidal_encode_with_exp(t, var, 0, 4))
    zero = np.asarray(sinusoidal_encode_with_exp(t, jnp.zeros((4, 1)), 0, 4))
    damp = np.exp(-0.5 * np.array([i * 2.0 ** i for i in range(4)]))
    # withexp layout (x_dim=1): [identity, (sin_i, cos_i) for i in 0..3]
    for i in range(4):
        np.testing.assert_allclose(enc[:, 1 + 2 * i], zero[:, 1 + 2 * i] * damp[i], atol=1e-5)
        np.testing.assert_allclose(enc[:, 2 + 2 * i], zero[:, 2 + 2 * i] * damp[i], atol=1e-5)
    # identity passthrough
    np.testing.assert_allclose(enc[:, 0], 0.3, atol=1e-6)


def test_sh_deg2_shape_and_values():
    d = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    out = np.asarray(sh_encode_deg2(d))
    assert out.shape == (2, 4)
    np.testing.assert_allclose(out[0], [0.28209479, 0.0, 0.48860251, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[1], [0.28209479, 0.0, 0.0, -0.48860251], atol=1e-6)
