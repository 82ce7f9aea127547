"""Proposal-network (density-field resampling) sampler — dense TPU layout.

The working realization of the reference's *intent* in train_prop_real.py
(it declares NGPDensityField proposal nets at :120-127/:194-207 but never
wires them, and imports a module that doesn't exist — SURVEY §2a#2). The
semantics follow nerfacc's PropNetEstimator / mip-NeRF 360:

  * initial sample edges uniform in s-space, with s -> t either linear or
    linear-in-disparity ('lindisp');
  * per proposal level: query the density field at interval midpoints,
    compute weights by the transmittance scan, then draw the next level's
    edges by inverse-CDF resampling (piecewise-uniform within bins, with
    the mip-NeRF 360 weight padding);
  * the proposal loss is the mip-NeRF 360 "outer measure" bound: proposal
    weights must upper-bound the final weights wherever their intervals
    overlap, with the final weights stop-gradiented;
  * loss annealing over the first `anneal_steps` steps.

Everything is fixed-shape [n_rays, n_samples] — no occupancy grid and no
ragged packing, so this path is fully jit-friendly as-is.
"""

import os
from typing import Callable, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..utils.math import exclusive_cumsum
from .render import render_weights_from_density

# searchsorted lowering knob (round-5 floor attack): the prop loop's
# compiled TPU executable is ~53x the occ loop's (29 MB vs 0.55 MB) and its
# load/stage through the tunnel is the first-chunk floor (docs/QUALITY.md).
# "scan" is jnp's default binary search (while loops); "compare_all" lowers
# to one dense compare+reduce — more FLOPs (N*M compares, trivial at these
# shapes) but far less code. MEASURED on v5e (r5s2 prop_floor arms, 8192
# rays x 128 bins): compare_all cuts the cache-WARM first chunk 268.7 s ->
# 166.1 s AND the steady chunk 6.9 -> 4.7 s (the scan's sequential while
# iterations were also the slower RUN) — promoted to the default.
_SEARCH_METHOD = os.environ.get("CEDNERF_PROP_SEARCH", "compare_all")


def s_to_t(s, near, far, sampling_type: str = "lindisp"):
    """Map normalized s in [0,1] to metric t (nerfacc construct_ray_warps).

    near/far may be scalars or per-ray [R, 1] arrays.
    """
    near = jnp.asarray(near)
    far = jnp.asarray(far)
    if near.ndim == 1:
        near = near[:, None]
    if far.ndim == 1:
        far = far[:, None]
    if sampling_type == "uniform":
        return near + s * (far - near)
    # linear in disparity
    return 1.0 / (1.0 / near * (1.0 - s) + 1.0 / far * s)


def uniform_edges(n_rays: int, n_samples: int, key=None):
    """[n_rays, n_samples+1] monotone edges in [0, 1]; stratified if keyed."""
    edges = jnp.linspace(0.0, 1.0, n_samples + 1)
    edges = jnp.broadcast_to(edges, (n_rays, n_samples + 1))
    if key is not None:
        # jitter interior edges within their half-cells: edge i moves inside
        # [e_i - delta/2, e_i + delta/2], and adjacent windows touch without
        # overlapping, so the jittered sequence is monotone BY CONSTRUCTION
        # — no sort needed (a [R, N+1] sort compiles to a large unrolled
        # network on TPU; three of them were part of the prop program's
        # 29 MB executable bloat, round-5 program diet)
        delta = 1.0 / n_samples
        u = jax.random.uniform(key, (n_rays, n_samples + 1), minval=-0.5, maxval=0.5)
        u = u.at[:, 0].set(0.0).at[:, -1].set(0.0)
        edges = jnp.clip(edges + u * delta, 0.0, 1.0)
    return edges


def sample_from_weights(edges, weights, n_new: int, key=None,
                        padding: float = 0.01):
    """Inverse-CDF resampling of interval edges (nerfacc importance_sampling).

    Args:
      edges:   [R, N+1] s-space interval edges.
      weights: [R, N] interval weights (>= 0).
      n_new:   number of new intervals.
    Returns:
      [R, n_new+1] new edges, ordered, within [edges[0], edges[-1]].
    """
    r, n = weights.shape
    # mip-NeRF 360 weight padding: keeps empty regions sampleable
    weights = weights + padding / n
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.concatenate(
        [jnp.zeros((r, 1)), jnp.cumsum(pdf, axis=-1)], axis=-1
    )  # [R, N+1], last == 1
    cdf = cdf.at[:, -1].set(1.0)

    u = jnp.linspace(0.0, 1.0, n_new + 1)
    u = jnp.broadcast_to(u, (r, n_new + 1))
    if key is not None:
        # same half-cell jitter as uniform_edges: monotone by construction
        du = 1.0 / n_new
        jitter = jax.random.uniform(key, (r, n_new + 1), minval=-0.5, maxval=0.5)
        jitter = jitter.at[:, 0].set(0.0).at[:, -1].set(0.0)
        u = jnp.clip(u + jitter * du, 0.0, 1.0)

    # invert the cdf: bin index + linear interp inside the bin
    idx = jnp.clip(
        jax.vmap(lambda c, q: jnp.searchsorted(c, q, method=_SEARCH_METHOD),
                 (0, 0))(cdf, u) - 1, 0, n - 1
    )  # [R, n_new+1]
    cdf_lo = jnp.take_along_axis(cdf, idx, axis=-1)
    cdf_hi = jnp.take_along_axis(cdf, idx + 1, axis=-1)
    e_lo = jnp.take_along_axis(edges, idx, axis=-1)
    e_hi = jnp.take_along_axis(edges, idx + 1, axis=-1)
    denom = jnp.maximum(cdf_hi - cdf_lo, 1e-10)
    frac = jnp.clip((u - cdf_lo) / denom, 0.0, 1.0)
    # monotone u through a monotone CDF inverse -> new_edges is already
    # ordered (within a bin frac rises with u; across bins e_lo jumps to the
    # next bin's start); the defensive sort was a no-op that cost a
    # DIFFERENTIATED sorting network in the compiled program
    return e_lo + frac * (e_hi - e_lo)


class PropSamples(NamedTuple):
    """Per-level records needed for the proposal loss."""

    s_edges: jnp.ndarray  # [R, N+1] s-space edges
    weights: jnp.ndarray  # [R, N] rendering weights of the proposal field


def proposal_sampling(
    prop_density_fns: Sequence[Callable],
    prop_samples: Sequence[int],
    n_final: int,
    origins,
    viewdirs,
    near: float,
    far: float,
    *,
    sampling_type: str = "lindisp",
    key=None,
    anneal=1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, List[PropSamples]]:
    """Hierarchical PDF sampling through the proposal density fields.

    prop_density_fns: callables x [M, 3] -> density [M, 1] (already bound to
    params; queried at interval midpoints).
    Returns (t_starts [R, n_final], t_ends [R, n_final], per-level records).
    """
    n_rays = origins.shape[0]
    keys = jax.random.split(key, len(prop_samples) + 1) if key is not None else \
        [None] * (len(prop_samples) + 1)

    s_edges = uniform_edges(n_rays, prop_samples[0], keys[0])
    records: List[PropSamples] = []
    for level, (density_fn, n_samples) in enumerate(zip(prop_density_fns, prop_samples)):
        t_edges = s_to_t(s_edges, near, far, sampling_type)
        t0, t1 = t_edges[:, :-1], t_edges[:, 1:]
        mid = (t0 + t1) / 2.0
        pos = origins[:, None, :] + viewdirs[:, None, :] * mid[..., None]
        sigmas = density_fn(pos.reshape(-1, 3)).reshape(n_rays, n_samples)
        weights, _, _ = render_weights_from_density(
            t0, t1, sigmas, jnp.ones_like(sigmas, bool)
        )
        records.append(PropSamples(s_edges=s_edges, weights=weights))
        n_next = prop_samples[level + 1] if level + 1 < len(prop_samples) else n_final
        # annealing biases resampling toward uniform early in training
        resample_w = jax.lax.stop_gradient(weights) ** anneal
        s_edges = sample_from_weights(s_edges, resample_w, n_next, keys[level + 1])

    t_edges = s_to_t(s_edges, near, far, sampling_type)
    return t_edges[:, :-1], t_edges[:, 1:], records


def _outer_measure(t_env, w_env, t_query):
    """Sum of envelope weights over each query interval (mip-NeRF 360 outer).

    t_env: [R, N+1] envelope edges; w_env: [R, N]; t_query: [R, M+1].
    Returns [R, M]: for query interval i, the total envelope weight of
    intervals overlapping [t_query[i], t_query[i+1]] (the standard
    cumsum + searchsorted outer bound).
    """
    cw = jnp.concatenate(
        [jnp.zeros_like(w_env[:, :1]), jnp.cumsum(w_env, axis=-1)], axis=-1
    )  # [R, N+1]
    # index of the last env edge <= query edge (for lo) / >= (for hi)
    idx_lo = jnp.clip(
        jax.vmap(lambda e, q: jnp.searchsorted(
            e, q, side="right", method=_SEARCH_METHOD))(
                t_env, t_query[:, :-1]) - 1,
        0, w_env.shape[-1],
    )
    idx_hi = jnp.clip(
        jax.vmap(lambda e, q: jnp.searchsorted(
            e, q, side="left", method=_SEARCH_METHOD))(
                t_env, t_query[:, 1:]),
        0, w_env.shape[-1],
    )
    w_outer = jnp.take_along_axis(cw, idx_hi, axis=-1) - jnp.take_along_axis(cw, idx_lo, axis=-1)
    return jnp.maximum(w_outer, 0.0)


def proposal_loss(records: List[PropSamples], final_s_edges, final_weights):
    """mip-NeRF 360 proposal loss, summed over levels, mean over rays.

    Penalizes proposal envelopes that under-cover the final (stop-gradiented)
    weights: mean( clip(w_final - w_outer, 0)^2 / (w_final + eps) ).
    """
    w = jax.lax.stop_gradient(final_weights)
    sq = jax.lax.stop_gradient(final_s_edges)
    total = 0.0
    for rec in records:
        w_outer = _outer_measure(rec.s_edges, rec.weights, sq)
        total += jnp.mean(
            jnp.clip(w - w_outer, 0.0) ** 2 / (w + 1e-7)
        )
    return total


def anneal_factor(step, anneal_steps: int = 1000, slope: float = 10.0):
    """Proposal-weight annealing (nerfacc prop_net anneal): bias the
    resampling toward uniform early in training."""
    frac = jnp.clip(jnp.asarray(step, jnp.float32) / anneal_steps, 0.0, 1.0)
    return (slope * frac) / (1.0 + (slope - 1.0) * frac)
