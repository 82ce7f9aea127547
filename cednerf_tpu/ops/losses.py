"""Training losses over padded ray/sample batches.

Replaces the reference's loss assembly (train_real.py:369-409) and the CUDA
`torch_efficient_distloss.flatten_eff_distloss` (cednerf/losses.py:4-11,
SURVEY §2b N7) with closed-form masked reductions along the dense sample axis.
"""

import jax.numpy as jnp

from ..utils.math import exclusive_cumsum
from .segments import segment_broadcast, segment_sum


def distortion_loss(weights, t_starts, t_ends, mask=None, ray_weights=None):
    """Mip-NeRF 360 distortion loss, O(N) prefix-sum form, mean over rays.

    L(ray) = 2 * sum_i w_i (m_i * sum_{j<i} w_j - sum_{j<i} w_j m_j)
             + 1/3 * sum_i w_i^2 (t1_i - t0_i)
    which equals sum_{ij} w_i w_j |m_i - m_j| + 1/3 sum_i w_i^2 dt_i for
    samples sorted by t (they are, per ray). Matches flatten_eff_distloss's
    normalization: mean of per-ray sums.

    ray_weights: optional [R] 0/1 mask — budget-truncated rays carry
    partially-rendered weights, so the train loss excludes them here too.
    """
    if mask is not None:
        weights = weights * mask
    mid = (t_starts + t_ends) / 2.0
    interval = t_ends - t_starts
    wm = weights * mid
    w_prefix = exclusive_cumsum(weights, axis=-1)
    wm_prefix = exclusive_cumsum(wm, axis=-1)
    loss_bi = 2.0 * jnp.sum(weights * (mid * w_prefix - wm_prefix), axis=-1)
    loss_uni = (1.0 / 3.0) * jnp.sum(weights ** 2 * interval, axis=-1)
    return ray_mean(loss_bi + loss_uni, ray_weights)


def ray_mean(per_ray, ray_weights):
    """Mean over rays, optionally restricted to ray_weights (0/1 mask)."""
    if ray_weights is None:
        return jnp.mean(per_ray)
    w = ray_weights.reshape(per_ray.shape)
    return jnp.sum(per_ray * w) / jnp.maximum(jnp.sum(w), 1.0)


def opacity_loss(opacities, eps: float = 1e-6, ray_weights=None):
    """-acc * log(acc), mean (train_real.py:374). Clamped for log stability
    (the reference NaNs at acc == 0; we don't reproduce that).
    ray_weights: optional [R] 0/1 mask (budget-dropped rays excluded)."""
    acc = jnp.clip(opacities, eps, 1.0)
    return ray_mean(-acc * jnp.log(acc), ray_weights)


def acc_entropy_loss(opacities, eps: float = 1e-6, ray_weights=None):
    """Binary entropy of the residual transmittance (train_real.py:388-392)."""
    t_last = jnp.clip(1.0 - opacities, eps, 1.0 - eps)
    ent = -(t_last * jnp.log(t_last) + (1.0 - t_last) * jnp.log(1.0 - t_last))
    return ray_mean(ent, ray_weights)


def rgbper_loss(rgbs, pixels, weights, mask, ray_weights=None):
    """Per-sample color-to-pixel penalty (train_real.py:394-396).

    rgbs: [R, S, 3]; pixels: [R, 3]; weights detached upstream.
    sum_i ||rgb_i - pixel||^2 * w_i / n_rays; ray_weights optionally masks
    budget-truncated rays out of the mean.
    """
    per = jnp.sum((rgbs - pixels[:, None, :]) ** 2, axis=-1)
    per_ray = jnp.sum(per * weights * mask, axis=-1)
    return ray_mean(per_ray, ray_weights)


# ------------------------------------------------------------------- #
# Packed (compacted-buffer) loss forms for engine/renderer.py
# render_rays_budget_packed: per-slot arrays [B] with per-ray segment
# starts/counts. All per-ray plumbing runs through ops/segments.py
# segment sums (cumsum + [R]-sized boundary gathers): no [B]-sized
# take-by-ray or scatter-by-ray anywhere — those pay the v5e ~9 ns/row
# gather/scatter wall (tools/profile_layouts.py, docs/PERF_PLAN.md).
# ------------------------------------------------------------------- #


def _ray_base(prefix, starts, total):
    """[R] segment-base values of a [B] exclusive prefix (appends the
    grand total so starts == B, an overflow-clamped start, stays legal)."""
    return jnp.take(jnp.concatenate([prefix, total[None]]), starts)


def packed_ray_sum_mean(per_slot, starts, counts, budget, ray_weights):
    """ray_mean of per-ray sums of `per_slot` over packed segments.

    per_slot [B] must already be zero at invalid slots. ray_weights [R]
    (0/1 complete mask) or None (every ray counts)."""
    return ray_mean(segment_sum(per_slot, starts, counts, budget),
                    ray_weights)


def packed_distortion_loss(weights_p, t_starts_p, dts_p, starts, counts,
                           budget, ray_weights, n_blocks: int = 1):
    """distortion_loss on the packed buffer (same math, segment prefixes).

    Keeps the reference's pre-subtracted per-slot form
      per_slot = 2 w (mid*(cw - bw) - (cwm - bwm)) + w^2 dt / 3
    (per-ray prefixes = global prefixes minus segment-broadcast ray
    bases): every per-slot term stays O(1), so the final segment_sum's
    f32 cumsum carries only the O(sum w) render-channel scale. The
    algebraically equivalent fully-expanded form (segment sums of
    w*mid*cw etc.) is catastrophically cancelled in f32 — its channel
    cumsums grow ~quadratically with slot index (measured 71% loss-value
    error at 262k slots) — so it must NOT be used.
    """
    mid = t_starts_p + 0.5 * dts_p
    w = weights_p
    wm = w * mid
    cw = exclusive_cumsum(w, axis=0)
    cwm = exclusive_cumsum(wm, axis=0)
    bases = jnp.stack([_ray_base(cw, starts, jnp.sum(w)),
                       _ray_base(cwm, starts, jnp.sum(wm))], axis=-1)
    bases_b = segment_broadcast(bases, starts, budget, n_blocks)  # [B, 2]
    pref_w = cw - bases_b[:, 0]
    pref_wm = cwm - bases_b[:, 1]
    per_slot = 2.0 * w * (mid * pref_w - pref_wm) + w ** 2 * dts_p / 3.0
    return packed_ray_sum_mean(per_slot, starts, counts, budget, ray_weights)


def packed_rgbper_loss(rgbs_p, pixels, weights_p, starts, counts, budget,
                       ray_weights):
    """rgbper_loss on the packed buffer (weights detached by the caller).

    ||rgb - pix||^2 * w expands to S[w*||rgb||^2] - 2 pix . S[w*rgb]
    + ||pix||^2 S[w] per ray — one [B,5] segment_sum instead of a [B,3]
    pixel broadcast by ray id. (Unlike the distortion expansion, every
    channel here is O(w) per slot — no prefix-scale blowup.)
    """
    w = weights_p[:, None]
    chans = jnp.concatenate(
        [jnp.sum(rgbs_p ** 2, axis=-1, keepdims=True) * w,
         rgbs_p * w,
         w], axis=-1)                                        # [B, 5]
    s = segment_sum(chans, starts, counts, budget)           # [R, 5]
    per_ray = (s[:, 0] - 2.0 * jnp.sum(pixels * s[:, 1:4], axis=-1)
               + jnp.sum(pixels ** 2, axis=-1) * s[:, 4])
    return ray_mean(per_ray, ray_weights)


def packed_per_ray_mean(per_slot, valid_p, starts, counts, budget,
                        ray_weights):
    """ray_mean of per-ray MEANS over valid slots (reduce='mean' parity)."""
    s = segment_sum(jnp.stack([per_slot, valid_p], axis=-1),
                    starts, counts, budget)                  # [R, 2]
    return ray_mean(s[:, 0] / jnp.maximum(s[:, 1], 1.0), ray_weights)
