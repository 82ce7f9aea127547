"""Proposal-network training engine (the working train_prop_real.py path).

The reference declares proposal density fields but never wires them
(train_prop_real.py:120-127, :194-207 — SURVEY §2a#2 documents it as the
intent spec); this engine realizes that intent TPU-natively: proposal
PDF-resampling replaces the occupancy grid, the sample buffers are dense
[n_rays, n_samples] from the start (no compaction step needed), and the
proposal nets train jointly through the mip-NeRF 360 outer-bound loss
inside the same jitted step (the reference/nerfacc trains them with a
second optimizer inside the estimator; a joint Adam over the combined
pytree is the jit-friendly equivalent).
"""

import dataclasses
from typing import Any, NamedTuple, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models.field import NGPDensityField
from ..ops import losses as L
from ..ops.occupancy import RaySamples, ray_aabb_intersect
from ..ops.proposal import anneal_factor, proposal_loss, proposal_sampling
from .config import ModelFlags, SceneConfig
from .renderer import render_rays
from .train import make_optimizer


@dataclasses.dataclass(frozen=True)
class PropConfig:
    """Sampler shape config per scene family (train_prop_real.py intent)."""

    prop_resolutions: Tuple[int, ...] = (128,)
    prop_samples: Tuple[int, ...] = (128,)
    n_final: int = 64
    unbounded: bool = False
    sampling_type: str = "uniform"  # bounded scenes sample uniformly in t
    anneal_steps: int = 1000

    @classmethod
    def for_family(cls, family: str) -> "PropConfig":
        if family == "dnerf":
            return cls()
        # hypernerf / dynerf: two unbounded levels at 128/256 res
        return cls(
            prop_resolutions=(128, 256), prop_samples=(256, 96), n_final=48,
            unbounded=True, sampling_type="lindisp",
        )


class PropTrainState(NamedTuple):
    params: Any        # {'field': ..., 'props': (...,)}
    opt_state: Any


def build_prop_networks(cfg: SceneConfig, pcfg: PropConfig):
    return tuple(
        NGPDensityField(
            aabb=cfg.aabb, unbounded=pcfg.unbounded, n_levels=5,
            max_resolution=res, log2_hashmap_size=17,
        )
        for res in pcfg.prop_resolutions
    )


def create_prop_train_state(field, props, cfg: SceneConfig, key) -> PropTrainState:
    keys = jax.random.split(key, len(props) + 1)
    x = jnp.zeros((8, 3))
    t = jnp.zeros((8, 1))
    d = jnp.ones((8, 3))
    params = {
        "field": field.init(keys[0], x, t, d, return_internal=True),
        "props": tuple(p.init(k, x) for p, k in zip(props, keys[1:])),
    }
    tx = make_optimizer(cfg)
    return PropTrainState(params=params, opt_state=tx.init(params))


def make_prop_train_step(field, props, cfg: SceneConfig, flags: ModelFlags,
                         pcfg: PropConfig):
    """Jitted proposal-path train step: sample -> render -> losses -> Adam."""
    tx = make_optimizer(cfg)
    aabb = np.asarray(cfg.aabb, np.float32)

    @jax.jit
    def train_step(state: PropTrainState, batch, key, step):
        k_samp, = jax.random.split(key, 1)
        anneal = anneal_factor(step, pcfg.anneal_steps)

        if pcfg.unbounded:
            near = jnp.full((batch["origins"].shape[0],), cfg.near_plane)
            # lindisp handles far -> inf; clip to something sane
            far = jnp.full_like(near, min(cfg.far_plane, 1e4))
        else:
            t_min, t_max = ray_aabb_intersect(
                batch["origins"], batch["viewdirs"], jnp.asarray(aabb)
            )
            near = jnp.maximum(t_min, cfg.near_plane)
            far = jnp.maximum(jnp.minimum(t_max, cfg.far_plane), near + 1e-4)

        def loss_fn(params):
            prop_fns = [
                (lambda x, p=p, pp=pp: p.apply(pp, x))
                for p, pp in zip(props, params["props"])
            ]
            t0, t1, records = proposal_sampling(
                prop_fns, list(pcfg.prop_samples), pcfg.n_final,
                batch["origins"], batch["viewdirs"], near, far,
                sampling_type=pcfg.sampling_type, key=k_samp, anneal=anneal,
            )
            samples = RaySamples(t_starts=t0, t_ends=t1,
                                 mask=jnp.ones_like(t0, bool))
            out = render_rays(
                field, params["field"],
                batch["origins"], batch["viewdirs"], samples,
                batch["timestamps"], batch["color_bkgd"],
                alpha_thre=0.0, train=True,
            )
            mse = jnp.mean((out.rgb - batch["pixels"]) ** 2)
            loss = mse
            extras = out.extras
            # s-space final edges for the outer-bound loss
            if pcfg.sampling_type == "uniform":
                s0 = (t0 - near[:, None]) / (far[:, None] - near[:, None])
                s1 = (t1 - near[:, None]) / (far[:, None] - near[:, None])
            else:
                inv = lambda t: (1.0 / near[:, None] - 1.0 / t) / (
                    1.0 / near[:, None] - 1.0 / far[:, None])
                s0, s1 = inv(t0), inv(t1)
            s_edges = jnp.concatenate([s0, s1[:, -1:]], axis=-1)
            loss += proposal_loss(records, s_edges, extras["weights"])

            if flags.use_opacity_loss:
                loss += L.opacity_loss(out.opacity) * 1e-3
            if flags.distortion_loss:
                loss += L.distortion_loss(extras["weights"], t0, t1) * 1e-3
            if flags.acc_entropy_loss:
                loss += L.acc_entropy_loss(out.opacity) * 1e-3
            if flags.use_feat_predict:
                loss += jnp.mean(extras["latent_losses"])
            if flags.use_weight_predict:
                loss += jnp.mean(extras["weight_losses"])
            return loss, {"mse": mse, "n_samples": out.n_samples}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "mse": aux["mse"],
            "psnr": -10.0 * jnp.log(aux["mse"]) / jnp.log(10.0),
            "n_samples": aux["n_samples"],
        }
        return PropTrainState(params=params, opt_state=opt_state), metrics

    return train_step


def make_prop_eval_render_fn(field, props, cfg: SceneConfig, pcfg: PropConfig):
    """Jitted chunk renderer for the proposal path (no occupancy state)."""
    aabb = np.asarray(cfg.aabb, np.float32)

    @jax.jit
    def render_chunk(params, _occ_unused, origins, viewdirs, timestamp, render_bkgd):
        if pcfg.unbounded:
            near = jnp.full((origins.shape[0],), cfg.near_plane)
            far = jnp.full_like(near, min(cfg.far_plane, 1e4))
        else:
            t_min, t_max = ray_aabb_intersect(origins, viewdirs, jnp.asarray(aabb))
            near = jnp.maximum(t_min, cfg.near_plane)
            far = jnp.maximum(jnp.minimum(t_max, cfg.far_plane), near + 1e-4)
        prop_fns = [
            (lambda x, p=p, pp=pp: p.apply(pp, x))
            for p, pp in zip(props, params["props"])
        ]
        t0, t1, _ = proposal_sampling(
            prop_fns, list(pcfg.prop_samples), pcfg.n_final,
            origins, viewdirs, near, far, sampling_type=pcfg.sampling_type,
        )
        samples = RaySamples(t_starts=t0, t_ends=t1, mask=jnp.ones_like(t0, bool))
        t = jnp.broadcast_to(jnp.reshape(timestamp, (1, 1)), (origins.shape[0], 1))
        out = render_rays(field, params["field"], origins, viewdirs, samples, t,
                          render_bkgd, train=False)
        return out.rgb, out.opacity, out.depth

    return render_chunk
