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
import functools
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


def make_prop_optimizer(cfg: SceneConfig, grad_clip: float = 0.0,
                        weight_decay: float = 0.0):
    """The prop-path optimizer: Adam under a skip-nonfinite wrapper — the
    reference's AMP GradScaler semantics (train_real.py:412-419 skips steps
    whose scaled grads go inf/nan; SURVEY N9). Without it one bad step
    poisons the params forever — observed: the s20 ttq_prop arm hit 30 dB
    at step 112 then diverged to NaN near step 1k and never recovered
    (results/r3s20/ttq_prop_4k.log).

    grad_clip > 0 prepends global-norm clipping: the skip-nonfinite wrapper
    alone did NOT stop the ~step-1.2k divergence (r4s28 — the loss itself
    goes NaN from a finite-params forward, so the skip just freezes
    training); clipping bounds the pre-overflow parameter growth."""
    inner = make_optimizer(cfg)
    if grad_clip > 0:
        inner = optax.chain(optax.clip_by_global_norm(grad_clip), inner)
    if weight_decay > 0:
        # L2 pull toward zero on every parameter (hash tables included):
        # the prop path's novel-view rot is density drifting UP in cells the
        # concentrated sampler stops visiting (r5s1/r5s2 arms) — decay pulls
        # unvisited entries back toward init (density exp(-1) ~= 0.37,
        # which sits BELOW the occ-grid cull threshold, so eval-time culling
        # removes what the decay reclaims)
        inner = optax.chain(optax.add_decayed_weights(weight_decay), inner)
    return optax.apply_if_finite(inner, max_consecutive_errors=1000)


@dataclasses.dataclass(frozen=True)
class PropConfig:
    """Sampler shape config per scene family (train_prop_real.py intent)."""

    prop_resolutions: Tuple[int, ...] = (128,)
    prop_samples: Tuple[int, ...] = (128,)
    n_final: int = 64
    unbounded: bool = False
    sampling_type: str = "uniform"  # bounded scenes sample uniformly in t
    anneal_steps: int = 1000
    # global-norm gradient clip (0 = off) — see make_prop_optimizer
    grad_clip: float = 0.0
    # L2 weight decay toward zero (0 = off) — see make_prop_optimizer
    weight_decay: float = 0.0
    # pre-activation density cap (models/field.py density_clamp), applied
    # to the radiance field AND the proposal density fields by the prop
    # entry points. DEFAULT ON for the prop path: concentrated resampling
    # grows the density head geometrically until f32 exp overflow
    # (root-caused r4s30 — NaN at ~step 1.28k, docs/QUALITY.md); the cap
    # at e^20 is semantically invisible and measured to train through the
    # old divergence point (r4s30 prop_clamp_ttq).
    density_clamp: float = 20.0
    # NaN-source telemetry in the step metrics (sigma_max / w_max /
    # finite flags) for divergence diagnosis
    debug: bool = False

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


def create_prop_train_state(field, props, cfg: SceneConfig, key,
                            pcfg: PropConfig = None) -> PropTrainState:
    keys = jax.random.split(key, len(props) + 1)
    x = jnp.zeros((8, 3))
    t = jnp.zeros((8, 1))
    d = jnp.ones((8, 3))
    params = {
        "field": field.init(keys[0], x, t, d, return_internal=True),
        "props": tuple(p.init(k, x) for p, k in zip(props, keys[1:])),
    }
    tx = make_prop_optimizer(cfg, pcfg.grad_clip if pcfg else 0.0,
                         pcfg.weight_decay if pcfg else 0.0)
    return PropTrainState(params=params, opt_state=tx.init(params))


def _make_prop_step_impl(field, props, cfg: SceneConfig, flags: ModelFlags,
                         pcfg: PropConfig):
    """Un-jitted proposal-path step body (shared by the single-step fn and
    the scanned multi-step loop)."""
    tx = make_prop_optimizer(cfg, pcfg.grad_clip, pcfg.weight_decay)
    aabb = np.asarray(cfg.aabb, np.float32)

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
            aux = {"mse": mse, "n_samples": out.n_samples}
            if pcfg.debug:
                # NaN-source ordering: which quantity blows up first, and
                # at what step (r4s28: loss NaN at ~1.28k despite the
                # skip-nonfinite optimizer)
                aux["sigma_max"] = jnp.max(extras["sigmas"])
                aux["w_max"] = jnp.max(extras["weights"])
                aux["t_finite"] = jnp.all(jnp.isfinite(t0)).astype(jnp.float32)
                aux["prop_w_max"] = jnp.max(records[0].weights)
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "mse": aux["mse"],
            "psnr": -10.0 * jnp.log(aux["mse"]) / jnp.log(10.0),
            "n_samples": aux["n_samples"],
        }
        if pcfg.debug:
            fin = lambda tree: jnp.all(jnp.stack([
                jnp.all(jnp.isfinite(l.astype(jnp.float32)))
                for l in jax.tree_util.tree_leaves(tree)])).astype(jnp.float32)
            metrics.update(
                sigma_max=aux["sigma_max"], w_max=aux["w_max"],
                t_finite=aux["t_finite"], prop_w_max=aux["prop_w_max"],
                grads_finite=fin(grads), params_finite=fin(params),
            )
        return PropTrainState(params=params, opt_state=opt_state), metrics

    return train_step


def make_prop_train_step(field, props, cfg: SceneConfig, flags: ModelFlags,
                         pcfg: PropConfig):
    """Jitted proposal-path train step: sample -> render -> losses -> Adam."""
    return jax.jit(_make_prop_step_impl(field, props, cfg, flags, pcfg))


def make_prop_train_loop(field, props, cfg: SceneConfig, flags: ModelFlags,
                         pcfg: PropConfig, n_rays: int, sample_fn,
                         k_steps: int, mesh=None):
    """K proposal-path train steps per dispatch: lax.scan over the step.

    Same production treatment as the occupancy path's make_train_loop
    (engine/train.py): device-side ray sampling + multi-step scan amortize
    the ~30-40 ms host dispatch round trip of a tunneled chip, and the
    donated state updates in place. The prop path needs no occupancy
    cadence or ray buckets (sample shapes are dense [n_rays, n_samples]),
    so the loop is a plain scan.

    mesh: optional jax.sharding.Mesh (axis "data") — each step's batch is
    sharding-constrained along rays; the state stays replicated and GSPMD
    all-reduces the gradients (docs/PARALLELISM.md).

    Returns fn(state, data, key, step0) -> (state, stacked metrics [K]).
    """
    step_impl = _make_prop_step_impl(field, props, cfg, flags, pcfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def prop_loop(state: PropTrainState, data, key, step0):
        def body(state, i):
            k_all = jax.random.fold_in(key, i)
            k_batch, k_step = jax.random.split(k_all)
            batch = sample_fn(data, k_batch, n_rays, i)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                sh = NamedSharding(mesh, PartitionSpec("data"))
                batch = jax.tree_util.tree_map(
                    lambda x: (jax.lax.with_sharding_constraint(x, sh)
                               if getattr(x, "ndim", 0) >= 1
                               and x.shape[0] == n_rays else x),
                    batch)
            return step_impl(state, batch, k_step, step0 + i)

        return jax.lax.scan(body, state, jnp.arange(k_steps))

    return prop_loop


class PropTrainer:
    """Host-side proposal-path loop (the prop twin of train.Trainer).

    device_sampler: (data_pytree, sample_fn) pair (engine/sampling.py), or
    None with stacked_host=True + a dataset exposing `sample(n_rays, rng)`
    — each chunk's K batches are then host-assembled, stacked along a
    leading dim and double-buffered against the device dispatch (the
    DyNeRF IS path, whose multinomial sampling must stay on the host).
    """

    def __init__(self, field, props, cfg: SceneConfig, flags: ModelFlags,
                 pcfg: PropConfig, device_sampler, n_rays: int,
                 seed: int = 42, steps_per_call: int = 16, mesh=None,
                 dataset=None, occ_eval: bool = True):
        """occ_eval: maintain an occupancy grid on the occ path's EMA
        cadence (one sampled update per chunk; all-cells through warmup)
        purely for EVAL-TIME sample culling — the prop sampler trains only
        where proposals place samples, so weakly-observed free space keeps
        fog density that novel-view renders accumulate (measured: r4s31
        prop_ttq_warm train_view 62.2 dB vs novel-view 10.85). The occ
        path gets this culling structurally; the grid restores it here
        (the reference's GUI renders through the estimator the same way,
        gui.py:205-237). Training math is untouched."""
        self.field, self.props = field, props
        self.cfg, self.flags, self.pcfg = cfg, flags, pcfg
        self.key = jax.random.PRNGKey(seed)
        self.key, k_init = jax.random.split(self.key)
        self.state = create_prop_train_state(field, props, cfg, k_init, pcfg)
        self.step = 0
        self.n_rays = n_rays
        self.steps_per_call = steps_per_call
        self.mesh = mesh
        self.dataset = dataset
        self._prefetched = None
        self._stacked = device_sampler is None
        if self._stacked:
            if dataset is None:
                raise ValueError("stacked-host PropTrainer needs a dataset")
            from .sampling import make_stacked_sampler

            device_sampler = (None, make_stacked_sampler())
        if mesh is not None:
            from ..parallel import replicate

            self.state = replicate(self.state, mesh)
            if device_sampler[0] is not None:
                device_sampler = (replicate(device_sampler[0], mesh),
                                  device_sampler[1])
        self.device_sampler = device_sampler
        self.occ = None
        if occ_eval:
            from ..ops.occupancy import create_occ_grid
            from .train import make_occ_update_fn

            self.occ = create_occ_grid(cfg.aabb, cfg.grid_resolution,
                                       cfg.grid_nlvl)
            self._occ_warm = make_occ_update_fn(field, cfg, all_cells=True)
            self._occ_samp = make_occ_update_fn(field, cfg, all_cells=False)
            tp = getattr(dataset, "timestamps_pool", None)
            self.timestamps_pool = (
                jnp.asarray(np.asarray(tp, np.float32).reshape(-1, 1))
                if tp is not None
                else jnp.linspace(0.0, 1.0, 16).reshape(-1, 1))
        self._loop = make_prop_train_loop(
            field, props, cfg, flags, pcfg, n_rays,
            device_sampler[1], steps_per_call, mesh=mesh)

    def _assemble_stacked(self) -> dict:
        batches = [self.dataset.sample(self.n_rays, None)
                   for _ in range(self.steps_per_call)]
        return {
            k: np.stack([np.asarray(b[k]) for b in batches])
            for k in batches[0]
        }

    def run_chunk(self) -> dict:
        self.key, k = jax.random.split(self.key)
        if self._stacked:
            data = (self._prefetched if self._prefetched is not None
                    else self._assemble_stacked())
            self._prefetched = None
        else:
            data = self.device_sampler[0]
        self.state, metrics = self._loop(
            self.state, data, k, jnp.asarray(self.step, jnp.int32))
        if self._stacked:
            # dispatch above is async until the metric fetches below —
            # assemble the next chunk now so host sampling overlaps device
            self._prefetched = self._assemble_stacked()
        self.step += self.steps_per_call
        if self.occ is not None:
            self.key, k_occ = jax.random.split(self.key)
            occ_fn = (self._occ_warm
                      if self.step <= self.cfg.occ_warmup_steps
                      else self._occ_samp)
            self.occ = occ_fn(self.state.params["field"], self.occ,
                              self.timestamps_pool, k_occ)
        mse = float(jnp.mean(metrics["mse"]))
        out = {
            "loss": float(jnp.mean(metrics["loss"])),
            "mse": mse,
            "psnr": float(-10.0 * np.log(max(mse, 1e-12)) / np.log(10.0)),
            "n_samples": float(jnp.mean(metrics["n_samples"])),
            "num_rays": self.n_rays,
            "steps": self.steps_per_call,
        }
        if self.pcfg.debug:
            for k in ("sigma_max", "w_max", "prop_w_max"):
                out[k] = float(jnp.max(metrics[k]))
            for k in ("t_finite", "grads_finite", "params_finite"):
                out[k] = float(jnp.min(metrics[k]))
        return out


def make_prop_eval_render_fn(field, props, cfg: SceneConfig, pcfg: PropConfig):
    """Jitted chunk renderer for the proposal path.

    The occ slot of the render_image contract is honored when an
    occupancy state is passed (PropTrainer(occ_eval=True).occ): final
    samples in unoccupied cells are masked out — the fog filter the occ
    path applies structurally (see PropTrainer.occ_eval)."""
    aabb = np.asarray(cfg.aabb, np.float32)

    @jax.jit
    def render_chunk(params, occ_state, origins, viewdirs, timestamp, render_bkgd):
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
        mask = jnp.ones_like(t0, bool)
        if occ_state is not None:
            from ..ops.occupancy import occupancy_lookup

            t_mid = (t0 + t1) / 2.0
            pos = origins[:, None, :] + viewdirs[:, None, :] * t_mid[..., None]
            mask = occupancy_lookup(occ_state, pos)
        samples = RaySamples(t_starts=t0, t_ends=t1, mask=mask)
        t = jnp.broadcast_to(jnp.reshape(timestamp, (1, 1)), (origins.shape[0], 1))
        out = render_rays(field, params["field"], origins, viewdirs, samples, t,
                          render_bkgd, train=False)
        return out.rgb, out.opacity, out.depth

    return render_chunk
