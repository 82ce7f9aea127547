"""Golden-value regression tests (SURVEY §4 seam b).

Fixed-seed encoder outputs captured on CPU fp32. These guard the encoder
*semantics* (hash layout, interpolation, frequency/SH math) against
accidental drift while the implementations keep being reworked for speed;
any intentional semantic change must update these values explicitly.
"""

import numpy as np
import jax
import jax.numpy as jnp

from cednerf_tpu.ops.brick_grid import BrickGridSpec, brick_encode
from cednerf_tpu.ops.encoders import sh_encode_deg2, sinusoidal_encode
from cednerf_tpu.ops.hash_grid import HashGridSpec, hash_encode

X = jnp.asarray([[0.1, 0.2, 0.3], [0.9, 0.5, 0.05], [0.33, 0.77, 0.66]])


def test_brick_encode_golden():
    spec = BrickGridSpec(n_levels=4, n_features=2, base_res=4, max_res=64,
                         log2_hashmap_size=10)
    params = spec.init_params(jax.random.PRNGKey(7))
    out = brick_encode(X, params, spec, compute_dtype=jnp.float32)
    expected = np.array([
        [-2.2973e-05, 6.0129e-05, -4.4128e-05, 3.95e-06, 4.2601e-05,
         7.015e-06, -1.2473e-05, -4.6697e-05],
        [7.3891e-05, -2.8585e-05, -2.094e-05, -6.9963e-05, 1.3417e-05,
         -2.8924e-05, -2.6012e-05, -2.7661e-05],
        [-2.3227e-05, -1.1622e-05, 1.1502e-05, 6.697e-06, 4.9593e-05,
         3.895e-05, 5.1787e-05, -1.245e-06]])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4,
                               atol=1e-9)


def test_hash_encode_golden():
    hs = HashGridSpec(n_levels=3, n_features=2, base_res=4, max_res=32,
                      log2_hashmap_size=8)
    table = hs.init_table(jax.random.PRNGKey(3))
    out = hash_encode(X, table, hs, compute_dtype=jnp.float32)
    expected = np.array([
        [3.8829e-05, 6.233e-06, -6.445e-06, -1.2673e-05, 2.0673e-05,
         -1.7445e-05],
        [1.9148e-05, 5.5004e-05, -3.6304e-05, 2.62e-07, -1.6947e-05,
         -3.2634e-05],
        [-2.1314e-05, -1.8048e-05, -9.866e-06, 2.172e-06, 2.6596e-05,
         2.2002e-05]])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=2e-4,
                               atol=1e-9)


def test_sh_deg2_golden():
    d = X / jnp.linalg.norm(X, axis=-1, keepdims=True)
    out = sh_encode_deg2(d)
    expected = np.array([0.2820948, -0.261169, 0.3917536, -0.1305845])
    np.testing.assert_allclose(np.asarray(out[0]), expected, rtol=1e-5)


def test_sinusoidal_golden():
    out = sinusoidal_encode(X[:1, :2], 0, 2)
    expected = np.array([[0.1, 0.2, 0.0998334, 0.1986693, 0.1986693,
                          0.3894183, 0.9950042, 0.9800665, 0.9800665,
                          0.921061]])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)
