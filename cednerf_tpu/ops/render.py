"""Dense (padded) volume-rendering primitives.

TPU-native replacement for nerfacc's packed CUDA kernels
(`render_weight_from_density`, `render_transmittance_from_density`,
`accumulate_along_rays[_]` — reference call sites cednerf/render.py:81-87,
:158-169 and cednerf/utils.py:274-299, SURVEY §2b N2). Samples live in padded
[n_rays, s_max] buffers with a validity mask, so the per-ray-segment
transmittance scan becomes a plain masked cumulative sum along the sample
axis and "accumulation along rays" becomes a masked sum — no scatters.
"""

from typing import Optional

import jax.numpy as jnp

from ..utils.math import exclusive_cumsum


def render_weights_from_density(
    t_starts,
    t_ends,
    sigmas,
    mask,
    prefix_trans: Optional[jnp.ndarray] = None,
):
    """Per-ray transmittance scan: T_i = prod_{j<i}(1 - alpha_j), w_i = T_i alpha_i.

    Args:
      t_starts, t_ends, sigmas, mask: [n_rays, s_max]; sigmas in fp32.
      prefix_trans: optional [n_rays] transmittance carried in from earlier
        samples (the chunked-inference mode of cednerf/render.py:42-56).
    Returns:
      (weights, trans, alphas), all [n_rays, s_max] fp32, zeroed at invalid slots.
    """
    sigmas = sigmas.astype(jnp.float32)
    sdelta = sigmas * (t_ends - t_starts) * mask
    alphas = 1.0 - jnp.exp(-sdelta)
    trans = jnp.exp(-exclusive_cumsum(sdelta, axis=-1))
    if prefix_trans is not None:
        trans = trans * prefix_trans[:, None]
    weights = trans * alphas
    return weights * mask, trans, alphas


def accumulate_along_rays(weights, values=None, mask=None):
    """Sum_i w_i * v_i over the sample axis (nerfacc accumulate_along_rays).

    weights: [n_rays, s_max]; values: [n_rays, s_max, C] or None (opacity).
    Returns [n_rays, C] (C=1 when values is None).
    """
    if mask is not None:
        weights = weights * mask
    if values is None:
        return jnp.sum(weights, axis=-1, keepdims=True)
    return jnp.sum(weights[..., None] * values, axis=-2)


def reduce_along_rays(values, mask, weights=None, reduce: str = "mean"):
    """Per-ray reduction of per-sample values (cednerf/render.py:8-39).

    values: [n_rays, s_max, C]; weights: optional [n_rays, s_max] multiplier.
    reduce='mean' averages over the ray's *valid* samples (matching
    scatter_reduce mean over contributing samples); 'sum' sums them.
    """
    src = values * mask[..., None]
    if weights is not None:
        src = src * weights[..., None]
    total = jnp.sum(src, axis=-2)
    if reduce == "sum":
        return total
    count = jnp.maximum(jnp.sum(mask, axis=-1, keepdims=True), 1)
    return total / count


def composite(
    weights,
    rgbs,
    t_starts,
    t_ends,
    mask,
    render_bkgd=None,
    eps: float = 1.1920929e-07,
):
    """Accumulate color/opacity/depth and composite the background.

    Mirrors cednerf/render.py:158-175: depth is the weight-average of segment
    midpoints normalized by opacity; background fills 1 - opacity.
    Returns (colors [R,3], opacities [R,1], depths [R,1]).
    """
    colors = accumulate_along_rays(weights, rgbs, mask)
    opacities = accumulate_along_rays(weights, None, mask)
    t_mid = ((t_starts + t_ends) / 2.0)[..., None]
    depths = accumulate_along_rays(weights, t_mid, mask)
    depths = depths / jnp.maximum(opacities, eps)
    if render_bkgd is not None:
        colors = colors + render_bkgd * (1.0 - opacities)
    return colors, opacities, depths
