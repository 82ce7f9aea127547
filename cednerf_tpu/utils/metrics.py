"""Image quality metrics: PSNR, SSIM, MS-SSIM (JAX).

MS-SSIM replaces the reference's CUDA `pytorch_msssim.ms_ssim` eval metric
(train_real.py:497-499, SURVEY §2b N8) with the same algorithm: gaussian
window 11/sigma 1.5, K=(0.01, 0.03), 5 scales with the standard weights,
2x average-pool between scales, relu'd contrast terms.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(pred, target, data_range: float = 1.0):
    mse = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / mse)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    coords = np.arange(size) - size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _blur(img, kernel):
    """Separable valid-mode gaussian blur of [N, C, H, W] (depthwise)."""
    c = img.shape[1]
    kh = jnp.asarray(kernel).reshape(1, 1, -1, 1)
    kw = jnp.asarray(kernel).reshape(1, 1, 1, -1)
    dn = jax.lax.conv_dimension_numbers(img.shape, (1, 1, kernel.size, 1),
                                        ("NCHW", "OIHW", "NCHW"))
    out = jax.lax.conv_general_dilated(
        img, jnp.tile(kh, (c, 1, 1, 1)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=c,
    )
    return jax.lax.conv_general_dilated(
        out, jnp.tile(kw, (c, 1, 1, 1)), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=c,
    )


def _ssim_and_cs(x, y, data_range: float, k1: float = 0.01, k2: float = 0.03):
    """Mean SSIM and contrast-sensitivity of [N, C, H, W] images."""
    kernel = _gaussian_kernel()
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu_x = _blur(x, kernel)
    mu_y = _blur(y, kernel)
    sigma_x = _blur(x * x, kernel) - mu_x ** 2
    sigma_y = _blur(y * y, kernel) - mu_y ** 2
    sigma_xy = _blur(x * y, kernel) - mu_x * mu_y
    cs_map = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    ssim_map = ((2 * mu_x * mu_y + c1) / (mu_x ** 2 + mu_y ** 2 + c1)) * cs_map
    return jnp.mean(ssim_map), jnp.mean(cs_map)


def _avg_pool2(x):
    """2x average pooling with odd-dim edge padding (pytorch_msssim behavior)."""
    pad_h = x.shape[2] % 2
    pad_w = x.shape[3] % 2
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_h), (0, pad_w)), mode="edge")
    n, c, h, w = x.shape
    return x.reshape(n, c, h // 2, 2, w // 2, 2).mean(axis=(3, 5))


def _to_nchw(img):
    img = jnp.asarray(img, jnp.float32)
    if img.ndim == 3:  # [H, W, C]
        img = img[None]
    if img.shape[-1] in (1, 3) and img.shape[1] not in (1, 3):
        img = jnp.transpose(img, (0, 3, 1, 2))
    return img


@functools.partial(jax.jit, static_argnames=("data_range",))
def ssim(pred, target, data_range: float = 1.0):
    """Single-scale SSIM of [H, W, C] (or [N, C, H, W]) images."""
    x, y = _to_nchw(pred), _to_nchw(target)
    s, _ = _ssim_and_cs(x, y, data_range)
    return s


@functools.partial(jax.jit, static_argnames=("data_range",))
def ms_ssim(pred, target, data_range: float = 1.0):
    """Multi-scale SSIM of [H, W, C] (or [N, C, H, W]) images in [0, range].

    Uses the full 5 scales when min(H, W) > 160 (pytorch_msssim's validity
    constraint — it raises below that); smaller images gracefully drop the
    scales whose pooled size falls under the 11-tap window, renormalizing
    the remaining weights, instead of producing NaN.
    """
    x, y = _to_nchw(pred), _to_nchw(target)
    # shapes are static under jit: count the scales that keep the pooled
    # image at least as large as the gaussian window
    levels = 1
    h, w = x.shape[2], x.shape[3]
    while levels < len(MSSSIM_WEIGHTS) and min(h, w) >= 2 * 11:
        levels += 1
        h, w = (h + 1) // 2, (w + 1) // 2
    vals = []
    for i in range(levels):
        s, cs = _ssim_and_cs(x, y, data_range)
        vals.append(s if i == levels - 1 else cs)
        if i < levels - 1:
            x, y = _avg_pool2(x), _avg_pool2(y)
    vals = jax.nn.relu(jnp.stack(vals))  # relu'd like pytorch_msssim
    weights = jnp.asarray(MSSSIM_WEIGHTS[:levels])
    if levels < len(MSSSIM_WEIGHTS):  # keep exact pytorch_msssim weights
        weights = weights / weights.sum()  # at full scale count
    return jnp.prod(vals ** weights)


# ------------------------------------------------------------------ #
# Turbo colormap (depth visualization) — replaces cv2.COLORMAP_TURBO
# (train_real.py:38-43) with the published polynomial approximation.

_TURBO_R = np.array([0.13572138, 4.61539260, -42.66032258, 132.13108234,
                     -152.94239396, 59.28637943])
_TURBO_G = np.array([0.09140261, 2.19418839, 4.84296658, -14.18503333,
                     4.27729857, 2.82956604])
_TURBO_B = np.array([0.10667330, 12.64194608, -60.58204836, 110.36276771,
                     -89.90310912, 27.34824973])


def _turbo_poly(coef, x):
    return sum(c * x ** i for i, c in enumerate(coef))


def depth_to_img(depth) -> np.ndarray:
    """Normalize a depth map and colorize it with the Turbo colormap.

    Parity with the reference's depth2img (train_real.py:38-43). Returns
    uint8 [H, W, 3].
    """
    depth = np.asarray(depth, np.float32)
    depth = depth.reshape(depth.shape[0], depth.shape[1])
    lo, hi = depth.min(), depth.max()
    x = (depth - lo) / max(hi - lo, 1e-8)
    rgb = np.stack([
        _turbo_poly(_TURBO_R, x),
        _turbo_poly(_TURBO_G, x),
        _turbo_poly(_TURBO_B, x),
    ], axis=-1)
    return (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
