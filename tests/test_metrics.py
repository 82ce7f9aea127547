"""Metric tests: SSIM vs a naive numpy implementation, MS-SSIM properties,
PSNR, turbo depth colormap."""

import numpy as np
import jax.numpy as jnp

from cednerf_tpu.utils.metrics import depth_to_img, ms_ssim, psnr, ssim


def naive_ssim(x, y, data_range=1.0, size=11, sigma=1.5):
    """Direct per-window SSIM with an explicit gaussian window (numpy)."""
    coords = np.arange(size) - size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    win = np.outer(g, g)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    def blur(im):
        h, w = im.shape
        out = np.zeros((h - size + 1, w - size + 1))
        for i in range(out.shape[0]):
            for j in range(out.shape[1]):
                out[i, j] = np.sum(im[i:i + size, j:j + size] * win)
        return out

    vals = []
    for c in range(x.shape[-1]):
        xc, yc = x[..., c], y[..., c]
        mx, my = blur(xc), blur(yc)
        sx = blur(xc * xc) - mx ** 2
        sy = blur(yc * yc) - my ** 2
        sxy = blur(xc * yc) - mx * my
        s = ((2 * mx * my + c1) * (2 * sxy + c2)) / ((mx ** 2 + my ** 2 + c1) * (sx + sy + c2))
        vals.append(s.mean())
    return np.mean(vals)


def test_ssim_matches_naive():
    rng = np.random.default_rng(0)
    x = rng.random((24, 24, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)
    got = float(ssim(jnp.asarray(x), jnp.asarray(y)))
    want = naive_ssim(x, y)
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_ssim_identity_is_one():
    x = np.random.default_rng(1).random((32, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(float(ssim(jnp.asarray(x), jnp.asarray(x))), 1.0,
                               atol=1e-5)


def test_ms_ssim_properties():
    rng = np.random.default_rng(2)
    x = rng.random((192, 192, 3)).astype(np.float32)
    same = float(ms_ssim(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(same, 1.0, atol=1e-4)
    noisy = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
    very_noisy = np.clip(x + rng.normal(0, 0.4, x.shape), 0, 1).astype(np.float32)
    a = float(ms_ssim(jnp.asarray(x), jnp.asarray(noisy)))
    b = float(ms_ssim(jnp.asarray(x), jnp.asarray(very_noisy)))
    assert 1.0 > a > b > 0.0


def test_psnr():
    x = np.zeros((8, 8, 3), np.float32)
    y = np.full((8, 8, 3), 0.1, np.float32)
    np.testing.assert_allclose(float(psnr(jnp.asarray(x), jnp.asarray(y))), 20.0,
                               rtol=1e-4)


def test_depth_to_img():
    depth = np.linspace(0, 5, 64).reshape(8, 8)
    img = depth_to_img(depth)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    # turbo: low -> blue-ish, high -> red-ish (the polynomial approximation is
    # slightly off at the exact endpoints, so probe just inside)
    assert img[0, 1, 2] > img[0, 1, 0]   # x ~= 0.016
    assert img[-1, -1, 0] > img[-1, -1, 2]


def test_ms_ssim_small_images_finite():
    """Images too small for the 5-scale pyramid drop scales instead of
    returning NaN (pytorch_msssim raises; train_real eval on small frames
    should still report a number)."""
    import numpy as np

    from cednerf_tpu.utils.metrics import ms_ssim

    rng = np.random.default_rng(3)
    a = rng.random((16, 16, 3), dtype=np.float32)
    v_same = float(ms_ssim(a, a))
    v_diff = float(ms_ssim(a, 1.0 - a))
    assert np.isfinite(v_same) and np.isfinite(v_diff)
    assert v_same > 0.99
    assert v_diff < v_same
