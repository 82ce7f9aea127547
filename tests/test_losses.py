"""Loss tests: O(N) distortion vs a naive O(N^2) double sum, etc."""

import numpy as np
import jax.numpy as jnp

from cednerf_tpu.ops.losses import (
    acc_entropy_loss,
    distortion_loss,
    opacity_loss,
    rgbper_loss,
)


def naive_distortion(w, t0, t1, mask):
    R, S = w.shape
    total = 0.0
    for r in range(R):
        mid = (t0[r] + t1[r]) / 2
        wr = w[r] * mask[r]
        bi = 0.0
        for i in range(S):
            for j in range(S):
                bi += wr[i] * wr[j] * abs(mid[i] - mid[j])
        uni = (1 / 3) * np.sum(wr ** 2 * (t1[r] - t0[r]))
        total += bi + uni
    return total / R


def test_distortion_matches_naive_quadratic():
    rng = np.random.default_rng(0)
    R, S = 3, 12
    t0 = np.sort(rng.uniform(0, 1, (R, S)), axis=1)
    t1 = t0 + rng.uniform(0.001, 0.01, (R, S))
    w = rng.uniform(0, 0.2, (R, S))
    mask = rng.uniform(size=(R, S)) > 0.25
    got = float(distortion_loss(jnp.asarray(w), jnp.asarray(t0), jnp.asarray(t1),
                                jnp.asarray(mask)))
    want = naive_distortion(w, t0, t1, mask)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_distortion_zero_for_single_sample():
    w = jnp.asarray([[1.0]])
    t0 = jnp.asarray([[0.5]])
    t1 = jnp.asarray([[0.5]])  # zero interval
    assert float(distortion_loss(w, t0, t1)) == 0.0


def test_opacity_loss_finite_at_zero():
    assert np.isfinite(float(opacity_loss(jnp.asarray([[0.0], [1.0]]))))


def test_entropy_loss_max_at_half():
    mid = float(acc_entropy_loss(jnp.asarray([[0.5]])))
    lo = float(acc_entropy_loss(jnp.asarray([[0.01]])))
    assert mid > lo
    np.testing.assert_allclose(mid, 2 * 0.5 * np.log(2), rtol=1e-4)


def test_rgbper_loss_zero_when_colors_match():
    rgbs = jnp.ones((2, 4, 3)) * 0.3
    pixels = jnp.ones((2, 3)) * 0.3
    w = jnp.ones((2, 4))
    mask = jnp.ones((2, 4), bool)
    assert float(rgbper_loss(rgbs, pixels, w, mask)) == 0.0
