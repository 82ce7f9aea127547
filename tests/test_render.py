"""Volume-rendering scan tests against naive per-ray references."""

import numpy as np
import jax.numpy as jnp

from cednerf_tpu.ops.render import (
    accumulate_along_rays,
    composite,
    reduce_along_rays,
    render_weights_from_density,
)


def naive_weights(t0, t1, sigma, mask):
    """Per-ray sequential transmittance scan (the nerfacc semantics)."""
    R, S = sigma.shape
    w = np.zeros((R, S))
    trans = np.ones((R, S))
    alphas = np.zeros((R, S))
    for r in range(R):
        T = 1.0
        for s in range(S):
            if not mask[r, s]:
                trans[r, s] = T
                continue
            a = 1.0 - np.exp(-sigma[r, s] * (t1[r, s] - t0[r, s]))
            trans[r, s] = T
            alphas[r, s] = a
            w[r, s] = T * a
            T *= 1.0 - a
    return w, trans, alphas


def _random_case(seed, R=4, S=16):
    rng = np.random.default_rng(seed)
    t0 = np.cumsum(rng.uniform(0.01, 0.1, (R, S)), axis=1)
    t1 = t0 + rng.uniform(0.01, 0.05, (R, S))
    sigma = rng.uniform(0, 20, (R, S))
    mask = rng.uniform(size=(R, S)) > 0.3
    return t0.astype(np.float32), t1.astype(np.float32), sigma.astype(np.float32), mask


def test_weights_match_naive():
    t0, t1, sigma, mask = _random_case(0)
    w, trans, alphas = render_weights_from_density(
        jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(sigma), jnp.asarray(mask)
    )
    w_ref, trans_ref, a_ref = naive_weights(t0, t1, sigma, mask)
    np.testing.assert_allclose(np.asarray(w), w_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(trans), trans_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(alphas), a_ref, rtol=1e-4, atol=1e-6)


def test_weights_sum_bounded_by_one():
    t0, t1, sigma, mask = _random_case(1)
    w, _, _ = render_weights_from_density(
        jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(sigma), jnp.asarray(mask)
    )
    acc = np.asarray(jnp.sum(w, axis=-1))
    assert (acc <= 1.0 + 1e-5).all()


def test_prefix_trans_chunking_equivalence():
    """Rendering all S samples must equal rendering two halves where the
    second carries the first's residual transmittance (the chunked-inference
    contract of render_weight_from_density_prefix, cednerf/render.py:42-56)."""
    t0, t1, sigma, mask = _random_case(2, R=3, S=20)
    w_full, _, _ = render_weights_from_density(
        jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(sigma), jnp.asarray(mask)
    )
    half = 10
    w1, _, _ = render_weights_from_density(
        jnp.asarray(t0[:, :half]), jnp.asarray(t1[:, :half]),
        jnp.asarray(sigma[:, :half]), jnp.asarray(mask[:, :half]),
    )
    prefix = 1.0 - jnp.sum(w1, axis=-1)
    w2, _, _ = render_weights_from_density(
        jnp.asarray(t0[:, half:]), jnp.asarray(t1[:, half:]),
        jnp.asarray(sigma[:, half:]), jnp.asarray(mask[:, half:]),
        prefix_trans=prefix,
    )
    got = np.concatenate([np.asarray(w1), np.asarray(w2)], axis=1)
    np.testing.assert_allclose(got, np.asarray(w_full), rtol=1e-4, atol=1e-6)


def test_composite_depth_and_background():
    t0, t1, sigma, mask = _random_case(3)
    rgbs = jnp.ones((*sigma.shape, 3)) * 0.5
    w, _, _ = render_weights_from_density(
        jnp.asarray(t0), jnp.asarray(t1), jnp.asarray(sigma), jnp.asarray(mask)
    )
    bkgd = jnp.asarray([1.0, 0.0, 0.0])
    colors, opac, depth = composite(w, rgbs, jnp.asarray(t0), jnp.asarray(t1),
                                    jnp.asarray(mask), render_bkgd=bkgd)
    opac_np = np.asarray(opac)
    np.testing.assert_allclose(
        np.asarray(colors)[:, 0], (0.5 * opac_np + (1 - opac_np))[:, 0], atol=1e-5
    )
    # depth within the sampled t range
    tmid = (t0 + t1) / 2
    assert (np.asarray(depth)[:, 0] <= tmid.max() + 1e-4).all()


def test_reduce_along_rays_mean_and_sum():
    mask = jnp.asarray([[True, True, False], [True, False, False]])
    vals = jnp.arange(12, dtype=jnp.float32).reshape(2, 3, 2)
    got_sum = np.asarray(reduce_along_rays(vals, mask, reduce="sum"))
    np.testing.assert_allclose(got_sum[0], [0 + 2, 1 + 3])
    got_mean = np.asarray(reduce_along_rays(vals, mask, reduce="mean"))
    np.testing.assert_allclose(got_mean[0], [1.0, 2.0])
    np.testing.assert_allclose(got_mean[1], [6.0, 7.0])


def test_accumulate_matches_manual():
    w = jnp.asarray([[0.25, 0.25], [0.5, 0.0]])
    v = jnp.asarray([[[1.0, 2.0], [3.0, 4.0]], [[5.0, 6.0], [7.0, 8.0]]])
    out = np.asarray(accumulate_along_rays(w, v))
    np.testing.assert_allclose(out, [[1.0, 1.5], [2.5, 3.0]])
