"""Training engine: optimizer schedule, jitted train step, occupancy updates,
and the host-side bucketed training loop.

Parity targets in the reference:
  * optimizer: Adam(lr=1e-2, eps=1e-15) (train_real.py:267-274)
  * schedule: LinearLR warmup (factor 0.01 -> 1 over 100 iters) chained with
    MultiStepLR(gamma=0.33) at the preset milestones (train_real.py:276-287)
  * loss assembly: MSE + opt-in extras (train_real.py:369-409)
  * occupancy update every 16 steps with random-t density probes
    (train_real.py:324-336)
  * dynamic ray batching targeting a constant sample count
    (train_real.py:354-360) — rebuilt as a *fixed* compacted field-evaluation
    budget (engine/renderer.py render_rays_budget) plus a small set of
    power-of-two ray-count buckets, so XLA compiles a handful of programs,
    not one per step.

The whole step (march + render + losses + Adam update) is one jitted program;
occupancy updates are two more (warmup / sampled). bf16 compute, fp32 params —
no GradScaler (the reference needs one for fp16; bf16 doesn't).
"""

import functools
from typing import Any, NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..ops import losses as L
from ..ops.occupancy import (OccGridState, create_occ_grid, march_candidates,
                             update_occ_grid)
from .config import ModelFlags, SceneConfig
from .renderer import (march_segments, pack_candidates, render_packed,
                       render_rays_budget, render_rays_budget_packed)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    occ: OccGridState


def make_lr_schedule(cfg: SceneConfig):
    """lr(step) = base * linear_warmup(step) * 0.33^(milestones passed)."""
    milestones = jnp.asarray(cfg.milestones, jnp.int32)

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        warm = jnp.clip(0.01 + (1.0 - 0.01) * count / 100.0, 0.01, 1.0)
        decay = 0.33 ** jnp.sum(count >= milestones.astype(jnp.float32))
        return cfg.lr * warm * decay

    return schedule


def make_optimizer(cfg: SceneConfig) -> optax.GradientTransformation:
    return optax.adam(learning_rate=make_lr_schedule(cfg), eps=1e-15)


def create_train_state(field, cfg: SceneConfig, key) -> TrainState:
    kp, = jax.random.split(key, 1)
    x = jnp.zeros((8, 3))
    t = jnp.zeros((8, 1))
    d = jnp.ones((8, 3))
    params = field.init(kp, x, t, d, return_internal=True)
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    occ = create_occ_grid(cfg.aabb, cfg.grid_resolution, cfg.grid_nlvl)
    return TrainState(params=params, opt_state=opt_state, occ=occ)


def make_occ_update_fn(field, cfg: SceneConfig, all_cells: bool):
    """Jitted occupancy EMA update. `timestamps_pool` is a fixed-size [N, 1]
    array of scene times; each probed cell gets a random time from it
    (the occ_eval_fn contract, train_real.py:324-328 — the reference draws
    from the current batch's timestamps, whose distribution this matches)."""

    @jax.jit
    def occ_update(params, occ: OccGridState, timestamps_pool, key) -> OccGridState:
        def density_fn(x, k):
            ti = jax.random.randint(k, (x.shape[0],), 0, timestamps_pool.shape[0])
            t = timestamps_pool[ti].reshape(-1, 1)
            res = field.apply(params, x, t, method=field.query_density)
            return res["density"] * cfg.render_step_size

        return update_occ_grid(
            occ, density_fn, key,
            occ_thre=cfg.occ_thre, ema_decay=cfg.occ_ema_decay,
            all_cells=all_cells,
        )

    return occ_update


def occ_mean_value(occ: OccGridState):
    visible = occ.occs >= 0.0
    return jnp.sum(jnp.where(visible, occ.occs, 0.0)) / jnp.maximum(jnp.sum(visible), 1)


def _make_one_step(field, cfg: SceneConfig, flags: ModelFlags, budget: int, tx,
                   s_cap: int = 0, use_seg: bool = False,
                   steady_march: bool = False):
    """The shared un-jitted train step: march + budgeted render + losses + Adam.

    batch: dict with origins [R,3], viewdirs [R,3], pixels [R,3],
    timestamps [R,1], color_bkgd [3]. The field-evaluation shape is fixed at
    `budget` samples; rays whose samples were dropped by the budget are
    masked out of the per-ray losses via the `complete` flag.

    s_cap > 0 packs each ray's valid candidates into [R, s_cap] before the
    cross-ray compaction (renderer.pack_candidates) — the steady-state
    program's lattice ops shrink by max_march_steps/s_cap. Truncated rays
    (> s_cap valid) are flagged incomplete. Leave 0 during occupancy warmup.

    use_seg routes marching through the two-stage segment compaction
    (renderer.march_segments, cfg.march_seg) instead of the dense candidate
    lattice — steady state only (a dense warmup grid truncates every
    segment).
    """
    # cone_angle > 0 grows dt with distance, so a segment's half-span can
    # exceed the pooled coarse grid's dilated reach and the coarse test
    # stops being a superset (valid samples silently dropped with
    # complete=1) — gate seg marching to uniform-step configs
    use_seg = bool(use_seg and cfg.march_seg and cfg.packed_render
                   and cfg.grid_nlvl == 1 and cfg.cone_angle == 0.0)
    # empty-space skipping: steady-state-only (the warmup grid is all-ones,
    # so every ray's "occupied" span is the full AABB traversal and the
    # shrunken lattice would mask everything); uniform steps only
    skip_empty = bool(steady_march and cfg.steady_march_steps
                      and cfg.steady_march_steps < cfg.max_march_steps
                      and cfg.cone_angle == 0.0 and not use_seg)
    march_steps = cfg.steady_march_steps if skip_empty else cfg.max_march_steps

    def one_step(state: TrainState, batch, key):
        k_march, = jax.random.split(key, 1)
        occ_mean = occ_mean_value(state.occ)

        if use_seg:
            span_slots = jnp.float32(0.0)
            ps = march_segments(
                state.occ, batch["origins"], batch["viewdirs"],
                batch["timestamps"],
                budget=budget,
                near_plane=cfg.near_plane,
                far_plane=cfg.far_plane,
                render_step_size=cfg.render_step_size,
                cone_angle=cfg.cone_angle,
                max_march_steps=cfg.max_march_steps,
                seg=cfg.march_seg,
                overcommit=cfg.seg_overcommit,
                pool=cfg.seg_pool,
                n_blocks=cfg.compact_blocks,
                stratified_key=k_march,
                compact_impl=cfg.compact_impl,
            )
            n_valid_full = ps.n_valid
        else:
            cand = march_candidates(
                state.occ,
                batch["origins"],
                batch["viewdirs"],
                near_plane=cfg.near_plane,
                far_plane=cfg.far_plane,
                render_step_size=cfg.render_step_size,
                cone_angle=cfg.cone_angle,
                max_march_steps=march_steps,
                stratified_key=k_march,
                probe_steps=cfg.max_march_steps if skip_empty else 0,
            )
            n_valid_full = jnp.sum(cand.valid)
            # occupied-span telemetry for the shrink-from-full steady-march
            # adaptation (Trainer): the lattice slots a steady lattice must
            # cover = last valid slot + 1, measured from the first occupied
            # 8-slot segment (advance_t_min skips whole segment quanta)
            any_v = jnp.any(cand.valid, axis=-1)
            last_v = (cand.valid.shape[1] - 1
                      - jnp.argmax(cand.valid[:, ::-1], axis=-1))
            first_v = jnp.argmax(cand.valid, axis=-1)
            span = jnp.where(any_v, last_v + 1 - (first_v // 8) * 8, 0)
            span_slots = jnp.max(span).astype(jnp.float32)
            if s_cap and s_cap < cfg.max_march_steps:
                cand, fits = pack_candidates(cand, s_cap)
            else:
                fits = None

        def loss_fn(params):
            if use_seg:
                out = render_packed(
                    field, params, ps, batch["color_bkgd"], occ_mean,
                    budget=budget, alpha_thre=cfg.alpha_thre, train=True,
                    n_blocks=cfg.compact_blocks,
                    assembly_impl=cfg.assembly_impl,
                )
            else:
                render = (render_rays_budget_packed if cfg.packed_render
                          else render_rays_budget)
                kw = ({"compact_impl": cfg.compact_impl,
                       "assembly_impl": cfg.assembly_impl}
                      if cfg.packed_render else {})
                if (cfg.packed_render and cfg.cone_angle == 0.0
                        and not (s_cap and s_cap < cfg.max_march_steps)):
                    # uniform steps on the UNPACKED lattice: per-slot t
                    # reconstructs from t_min[ray] + column*dt (s_cap
                    # packing reorders columns, so it disables this)
                    kw["uniform_dt"] = cfg.render_step_size
                out = render(
                    field, params,
                    batch["origins"], batch["viewdirs"], cand,
                    batch["timestamps"], batch["color_bkgd"], occ_mean,
                    budget=budget, alpha_thre=cfg.alpha_thre, train=True,
                    n_blocks=cfg.compact_blocks, ray_complete=fits, **kw,
                )
            extras = out.extras
            complete = extras["complete"]  # [R] 1.0 where no sample dropped
            denom = jnp.maximum(jnp.sum(complete), 1.0)
            sq = jnp.sum((out.rgb - batch["pixels"]) ** 2, axis=-1)
            mse = jnp.sum(complete * sq) / (3.0 * denom)
            loss = mse
            # opt-in regularizers (train_real.py:369-409); every per-ray
            # reduction is complete-masked so budget/cap-truncated rays'
            # partially-rendered weights never bias gradients
            if flags.use_opacity_loss:
                loss += L.opacity_loss(out.opacity, ray_weights=complete) * 1e-3
            if flags.acc_entropy_loss:
                loss += L.acc_entropy_loss(out.opacity, ray_weights=complete) * 1e-3
            if extras.get("packed"):
                starts, counts = extras["starts"], extras["counts"]
                if flags.distortion_loss:
                    loss += L.packed_distortion_loss(
                        extras["weights_p"], extras["t_starts_p"],
                        extras["dts_p"], starts, counts, budget,
                        complete, n_blocks=cfg.compact_blocks) * 1e-3
                if flags.weight_rgbper:
                    loss += L.packed_rgbper_loss(
                        extras["rgbs_p"], batch["pixels"],
                        jax.lax.stop_gradient(extras["weights_p"]),
                        starts, counts, budget, complete) * 1e-3
                if flags.use_feat_predict:
                    loss += L.packed_ray_sum_mean(
                        extras["latent_p"]
                        * jax.lax.stop_gradient(extras["weights_p"]),
                        starts, counts, budget, complete)
                if flags.use_weight_predict:
                    loss += L.packed_per_ray_mean(
                        extras["weight_loss_p"] * extras["weights_p"],
                        extras["valid_p"], starts, counts, budget, complete)
            else:
                if flags.distortion_loss:
                    loss += L.distortion_loss(
                        extras["weights"], extras["t_starts"], extras["t_ends"],
                        extras["mask"], ray_weights=complete,
                    ) * 1e-3
                if flags.weight_rgbper:
                    loss += L.rgbper_loss(
                        extras["rgbs"], batch["pixels"],
                        jax.lax.stop_gradient(extras["weights"]), extras["mask"],
                        ray_weights=complete,
                    ) * 1e-3
                if flags.use_feat_predict:
                    loss += L.ray_mean(
                        extras["latent_losses"].reshape(-1), complete)
                if flags.use_weight_predict:
                    loss += L.ray_mean(
                        extras["weight_losses"].reshape(-1), complete)
            aux = {
                "mse": mse,
                "n_samples": out.n_samples,
                # pre-packing demand: the host's ray-count feedback must see
                # truncated rays' full demand
                "n_valid": n_valid_full,
                "max_depth": jnp.max(out.depth),
                # fraction of rays fully rendered (no budget/cap truncation);
                # a drift below ~0.99 at steady state means demand estimation
                # is systematically biasing training against late-batch rays
                "complete_frac": jnp.mean(complete),
            }
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "mse": aux["mse"],
            "n_samples": aux["n_samples"].astype(jnp.float32),
            "n_valid": aux["n_valid"].astype(jnp.float32),
            "max_depth": aux["max_depth"],
            "complete_frac": aux["complete_frac"],
            "span_slots": span_slots,
        }
        return TrainState(params=params, opt_state=opt_state, occ=state.occ), metrics

    return one_step


def make_train_step(field, cfg: SceneConfig, flags: ModelFlags,
                    budget: Optional[int] = None, s_cap: int = 0,
                    use_seg: bool = False):
    """Jitted single train step (see _make_one_step for the batch contract).

    s_cap: steady-state per-ray candidate cap (0 = uncapped; see
    _make_one_step). The Trainer's scanned loop applies cfg.steady_s_cap
    automatically; this standalone step stays uncapped by default so it is
    safe in any phase. use_seg routes marching through the two-stage
    segment path (steady-state only; see _make_one_step)."""
    tx = make_optimizer(cfg)
    one_step = _make_one_step(field, cfg, flags, budget or cfg.sample_budget,
                              tx, s_cap=s_cap, use_seg=use_seg)

    @jax.jit
    def train_step(state: TrainState, batch, key):
        state, metrics = one_step(state, batch, key)
        metrics["psnr"] = -10.0 * jnp.log(metrics["mse"]) / jnp.log(10.0)
        return state, metrics

    return train_step


def make_train_loop(field, cfg: SceneConfig, flags: ModelFlags,
                    n_rays: int, sample_fn, k_steps: int,
                    warmup_phase: bool = False,
                    budget: Optional[int] = None, mesh=None):
    """K train steps per dispatch: lax.scan over the jitted step.

    mesh: optional jax.sharding.Mesh (axis "data") — each step's sampled ray
    batch is sharding-constrained to P("data"), so GSPMD partitions the
    whole march/render/backward along rays and all-reduces the gradients
    (state replicated; pair with cfg.compact_blocks == mesh.size to keep
    the budget compaction shard-local).

    Amortizes host round-trip latency (measured ~30-40 ms/dispatch on a
    tunneled chip) and keeps ray sampling on-device. `sample_fn(data, key,
    n_rays, i)` is a device sampler (engine/sampling.py); `i` is the step
    index within the scan (stacked host-batch samplers slice by it, true
    device samplers ignore it). Occupancy updates run
    on their normal cadence inside the scan via lax.cond (warmup = all
    cells, after = sampled quarter).

    Returns fn(state, data, timestamps_pool, key, step0) ->
    (state, stacked metrics over the K steps).
    """
    tx = make_optimizer(cfg)

    def occ_update_inline(params, occ, timestamps_pool, key, warm: bool):
        def density_fn(x, k):
            ti = jax.random.randint(k, (x.shape[0],), 0, timestamps_pool.shape[0])
            t = timestamps_pool[ti].reshape(-1, 1)
            res = field.apply(params, x, t, method=field.query_density)
            return res["density"] * cfg.render_step_size

        return update_occ_grid(
            occ, density_fn, key, occ_thre=cfg.occ_thre,
            ema_decay=cfg.occ_ema_decay, all_cells=warm,
        )

    one_step = _make_one_step(
        field, cfg, flags, budget or cfg.sample_budget, tx,
        s_cap=0 if warmup_phase else cfg.steady_s_cap,
        use_seg=not warmup_phase,
        steady_march=not warmup_phase,
    )

    # donate the state: params + Adam moments (~300 MB at real table sizes)
    # update in place instead of allocating fresh outputs per dispatch
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_loop(state: TrainState, data, timestamps_pool, key, step0):
        def body(carry, i):
            state = carry
            step = step0 + i
            k_all = jax.random.fold_in(key, i)
            k_occ, k_batch, k_step = jax.random.split(k_all, 3)

            def do_update(occ):
                # the all-cells warmup branch is a large subprogram; it is
                # only compiled into the warmup-phase loop
                if warmup_phase:
                    return jax.lax.cond(
                        step < cfg.occ_warmup_steps,
                        lambda: occ_update_inline(state.params, occ,
                                                  timestamps_pool, k_occ, True),
                        lambda: occ_update_inline(state.params, occ,
                                                  timestamps_pool, k_occ, False),
                    )
                return occ_update_inline(state.params, occ, timestamps_pool,
                                         k_occ, False)

            occ = jax.lax.cond(
                step % cfg.occ_update_interval == 0,
                do_update, lambda o: o, state.occ,
            )
            state = state._replace(occ=occ)
            batch = sample_fn(data, k_batch, n_rays, i)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                sh = NamedSharding(mesh, PartitionSpec("data"))
                batch = jax.tree_util.tree_map(
                    lambda x: (jax.lax.with_sharding_constraint(x, sh)
                               if getattr(x, "ndim", 0) >= 1
                               and x.shape[0] == n_rays else x),
                    batch)
            return one_step(state, batch, k_step)

        state, metrics = jax.lax.scan(body, state, jnp.arange(k_steps))
        return state, metrics

    return train_loop


class Trainer:
    """Host-side training loop: occupancy cadence + bucketed batch shapes.

    The dataset must expose `sample(num_rays, rng) -> batch dict` (numpy or
    jnp arrays) and a fixed `timestamps_pool` [N, 1] array of scene times.
    """

    def __init__(self, field, cfg: SceneConfig, flags: ModelFlags, dataset,
                 seed: int = 42, device_sampler=None, steps_per_call: int = 16,
                 adapt_bucket: bool = True, stacked_host: bool = False,
                 mesh=None, adapt_steady: bool = True):
        """device_sampler: optional (data_pytree, sample_fn) pair
        (engine/sampling.py) enabling the scanned multi-step fast path.
        stacked_host=True runs the same scanned path for host-sampling
        datasets: each chunk's K batches are assembled on the host (stacked
        along a leading dim) and the NEXT chunk is assembled while the
        device runs the current one (double buffering; the dispatch is
        async until the metrics fetch). Host RNG then lives in the dataset,
        so `resume` restores the step/bucket but not the sample sequence.
        adapt_bucket=False freezes the (n_rays, s_max) bucket after warmup —
        one steady-state program instead of one per visited bucket (used by
        bench runs where compile count matters).
        mesh: optional jax.sharding.Mesh (axis "data") for ray-sharded data
        parallelism — state/sampler data replicated, each step's rays
        sharded, gradients all-reduced by GSPMD (docs/PARALLELISM.md);
        pair with cfg.compact_blocks == mesh.size."""
        self.field = field
        self.cfg = cfg
        self.flags = flags
        self.dataset = dataset
        self.key = jax.random.PRNGKey(seed)
        self.key, init_key = jax.random.split(self.key)
        self.state = create_train_state(field, cfg, init_key)
        self.step = 0
        # start at the smallest ray bucket: early training has a dense grid,
        # so demand/ray ~ max_march_steps and the budget fits few rays
        self.bucket = cfg.ray_buckets()[0]
        # adaptive empty-space-skip lattice: starts at the configured
        # steady_march_steps and doubles (toward max_march_steps = skip off)
        # whenever steady-state complete_frac shows SPAN truncation — rays
        # whose occupied span exceeds the lattice are loss-masked forever
        # otherwise (measured: -0.7 train dB / -8 view dB on the texture
        # scene at 512 slots, results/r3s20/texture_cell_ftr)
        self.steady_march = cfg.steady_march_steps
        # adapt_steady=False pins the configured lattice (bench runs measure
        # a fixed shape; the complete_frac telemetry still reports)
        self.adapt_steady = adapt_steady
        self._incomplete_chunks = 0
        # shrink-from-full bookkeeping (cfg.steady_march_auto)
        self._complete_chunks = 0
        self._shrink_cooldown = 0
        self._step_fns = {}
        self._loop_fns = {}
        self._stacked = bool(stacked_host) and device_sampler is None
        self._prefetched = None
        if self._stacked:
            from .sampling import make_stacked_sampler

            device_sampler = (None, make_stacked_sampler())
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import replicate

            self.state = replicate(self.state, mesh)
            if device_sampler is not None and device_sampler[0] is not None:
                device_sampler = (replicate(device_sampler[0], mesh),
                                  device_sampler[1])
        self.device_sampler = device_sampler
        self.steps_per_call = steps_per_call
        self.adapt_bucket = adapt_bucket
        self._occ_warm = make_occ_update_fn(field, cfg, all_cells=True)
        self._occ_sampled = make_occ_update_fn(field, cfg, all_cells=False)
        self.timestamps_pool = jnp.asarray(
            np.asarray(dataset.timestamps_pool, np.float32).reshape(-1, 1)
        )

    def _warmup_now(self) -> bool:
        return self.step < self.cfg.occ_warmup_steps

    def _steady_margin(self) -> int:
        """Lattice slots advance_t_min's coarse probe can fire EARLY by:
        the probe is occupied within (dilate+1)*pool fine cells (diagonal)
        of real occupancy, plus one skip-segment quantum. Derived from the
        probe's own named geometry constants (ops/occupancy.py) and the
        per-axis fine-cell diagonal, so a change to advance_t_min's defaults
        cannot silently under-cover the shrink margin (ADVICE r4)."""
        from ..ops.occupancy import (SKIP_DILATE, SKIP_POOL_DEFAULT,
                                     SKIP_SEG_DEFAULT)

        cfg = self.cfg
        a = cfg.aabb
        cells = [(a[3] - a[0]) / cfg.grid_resolution,
                 (a[4] - a[1]) / cfg.grid_resolution,
                 (a[5] - a[2]) / cfg.grid_resolution]
        diag = float(np.sqrt(sum(c * c for c in cells)))
        reach = (SKIP_DILATE + 1) * SKIP_POOL_DEFAULT * diag
        return (int(np.ceil(reach / cfg.render_step_size))
                + SKIP_SEG_DEFAULT)

    def _step_fn(self):
        if "step" not in self._step_fns:
            self._step_fns["step"] = make_train_step(self.field, self.cfg,
                                                     self.flags)
        return self._step_fns["step"]

    def run_step(self) -> dict:
        cfg = self.cfg
        self.key, k_occ, k_batch, k_step = jax.random.split(self.key, 4)

        if self.step % cfg.occ_update_interval == 0:
            occ_fn = self._occ_warm if self._warmup_now() else self._occ_sampled
            occ = occ_fn(self.state.params, self.state.occ, self.timestamps_pool, k_occ)
            self.state = self.state._replace(occ=occ)

        n_rays = self.bucket
        batch = self.dataset.sample(n_rays, k_batch)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if self.mesh is not None:
            from ..parallel import shard_batch

            batch = shard_batch(batch, self.mesh)
        self.state, metrics = self._step_fn()(self.state, batch, k_step)

        # ray-count feedback (the reference's dynamic batch resize,
        # train_real.py:354-360): track valid-sample demand vs the budget
        n_valid = int(metrics["n_valid"])
        if n_valid > 0 and self.adapt_bucket and not self._warmup_now():
            self.bucket = cfg.pick_ray_bucket(n_valid / n_rays)

        self.step += 1
        return {k: float(v) for k, v in metrics.items()} | {
            "num_rays": n_rays,
        }

    # ---------------- scanned multi-step fast path ---------------- #

    def _assemble_stacked(self, n_rays: int) -> dict:
        """K host batches stacked along a leading dim (np, pre-transfer)."""
        batches = [self.dataset.sample(n_rays, None)
                   for _ in range(self.steps_per_call)]
        return {
            k: np.stack([np.asarray(b[k]) for b in batches])
            for k in batches[0]
        }

    def _loop_fn(self, n_rays: int):
        warmup = self._warmup_now()
        keyed = (n_rays, warmup, self.steady_march)
        if keyed not in self._loop_fns:
            import dataclasses

            cfg = self.cfg
            if self.steady_march != cfg.steady_march_steps:
                cfg = dataclasses.replace(
                    cfg, steady_march_steps=self.steady_march)
            data, sample_fn = self.device_sampler
            self._loop_fns[keyed] = make_train_loop(
                self.field, cfg, self.flags, n_rays, sample_fn,
                self.steps_per_call, warmup_phase=warmup, mesh=self.mesh,
            )
        return self._loop_fns[keyed]

    def run_chunk(self) -> dict:
        """Run `steps_per_call` steps in one dispatch (device sampling).

        Bucket feedback happens once per chunk instead of per step — the
        quantized version of the reference's per-step resize.
        """
        assert self.device_sampler is not None
        cfg = self.cfg
        n_rays = self.bucket
        self.key, k = jax.random.split(self.key)
        if self._stacked:
            if self._prefetched is not None and self._prefetched[0] == n_rays:
                data = self._prefetched[1]
            else:
                data = self._assemble_stacked(n_rays)
            self._prefetched = None
        else:
            data, _ = self.device_sampler
        self.state, metrics = self._loop_fn(n_rays)(
            self.state, data, self.timestamps_pool, k,
            jnp.asarray(self.step, jnp.int32),
        )
        if self._stacked:
            # the dispatch above is async until the metric fetches below —
            # assemble the next chunk NOW so host sampling overlaps device
            # compute (discarded if the ray bucket adapts this chunk)
            self._prefetched = (n_rays, self._assemble_stacked(n_rays))
        self.step += self.steps_per_call

        mean_samples = float(jnp.mean(metrics["n_samples"]))
        mean_valid = float(jnp.mean(metrics["n_valid"]))
        # bucket adaptation starts after warmup: the grid is dense until then
        # (the smallest ray bucket fits that), and freezing the shape avoids
        # compiling warmup-phase programs for transient buckets
        if mean_valid > 0 and not self._warmup_now() and self.adapt_bucket:
            self.bucket = cfg.pick_ray_bucket(mean_valid / n_rays)
        cf = float(jnp.mean(metrics["complete_frac"]))
        # span-truncation auto-repair: rays whose occupied span exceeds the
        # steady lattice are loss-masked FOREVER and the masked metrics hide
        # it (measured -0.7 train dB / -8 view dB on the texture scene at
        # 512 slots, results/r3s20/texture_cell_ftr). Double the lattice
        # when incompleteness PERSISTS (>= max_march_steps disables the
        # skip): at most log2(max/steady) recompiles. The persistence
        # requirement matters — the first post-warmup chunks are often
        # incomplete while occupancy carves (a transient), and a premature
        # bump is irreversible (measured -9.6% bench when the repair fired
        # during warmup, results/r3s21/confirm_bench).
        if cf < 0.99 and not self._warmup_now():
            self._incomplete_chunks += 1
        else:
            self._incomplete_chunks = 0
        if (self._incomplete_chunks >= 3 and self.adapt_steady
                and 0 < self.steady_march < cfg.max_march_steps):
            self.steady_march = min(2 * self.steady_march,
                                    cfg.max_march_steps)
            self._incomplete_chunks = 0
        # shrink-from-full (PERF_PLAN s25 inversion): start at the full
        # lattice, and once complete_frac holds at ~1.0 for 3 chunks,
        # shrink to the measured occupied-span maximum + the coarse-probe
        # margin. Never truncates by construction (span is the measured
        # max; the margin covers advance_t_min's conservative earliness);
        # if occupancy later grows, the doubling repair above recovers.
        if (self.adapt_steady and cfg.steady_march_auto
                and cfg.steady_march_steps == 0 and cfg.cone_angle == 0.0
                and cfg.max_march_steps >= 256 and not self._warmup_now()):
            self._shrink_cooldown -= 1
            if cf >= 0.995:
                self._complete_chunks += 1
            else:
                self._complete_chunks = 0
            span = float(jnp.max(metrics.get("span_slots", 0.0)))
            cur = self.steady_march or cfg.max_march_steps
            if (self._complete_chunks >= 3 and self._shrink_cooldown <= 0
                    and span > 0):
                target = int(-(-(span + self._steady_margin()) // 64) * 64)
                target = max(target, 128)
                if target < cur * 0.75 and target < cfg.max_march_steps:
                    self.steady_march = target
                    self._complete_chunks = 0
                    # re-evaluate only occasionally: each shrink recompiles
                    self._shrink_cooldown = 64
        if cf < 0.5 and not self._warmup_now():
            # most rays loss-masked: the masked MSE silently ignores them
            # (train metrics can even read as PSNR=inf). Rate-limited so a
            # transient post-warmup dip doesn't spam.
            self._incomplete_warns = getattr(self, "_incomplete_warns", 0) + 1
            if self._incomplete_warns <= 3:
                import warnings
                warnings.warn(
                    f"complete_frac={cf:.2f} at step {self.step}: most rays "
                    "were truncated and masked out of the loss. Likely "
                    "causes: steady_march_steps smaller than the occupied "
                    "span, or sample budget far below demand "
                    f"(n_valid={mean_valid:.0f}).")
        return {
            "loss": float(jnp.mean(metrics["loss"])),
            "mse": float(jnp.mean(metrics["mse"])),
            "psnr": float(-10.0 * jnp.log(jnp.mean(metrics["mse"])) / np.log(10.0)),
            "n_samples": mean_samples,
            "n_valid": mean_valid,
            "num_rays": n_rays,
            "steps": self.steps_per_call,
            "complete_frac": float(jnp.mean(metrics["complete_frac"])),
        }

    def resume(self, path: str) -> int:
        """Restore a mid-run checkpoint (state + step + RNG key + bucket).

        Checkpoints are written at step-loop boundaries, so resuming replays
        the exact step/RNG/bucket sequence of the uninterrupted run."""
        from .checkpoint import load_checkpoint_full

        self.state, self.step, key, bucket, steady = load_checkpoint_full(
            path, self.state)
        self.key = jnp.asarray(key, jnp.uint32)
        if bucket:
            self.bucket = bucket
        if steady:
            # restore the adaptive empty-space-skip lattice (ADVICE r3 #1):
            # without it a resumed run re-truncates spanning rays until the
            # auto-repair re-fires
            self.steady_march = steady
            self._incomplete_chunks = 0
        return self.step

    def run(self, total_steps: int, log_every: int = 10000, log_fn=print,
            hooks=(), checkpoint_dir=None, checkpoint_every: int = 0):
        """Drive training to `total_steps` using the fastest available path.

        hooks: iterable of (step, fn) pairs; each fn() runs once when training
        first reaches that step (e.g. a dataset's ISG->IST switch). Hooks at
        steps <= the current (resumed) step fire immediately.
        checkpoint_dir/checkpoint_every: write a resumable rolling checkpoint
        (see `resume`) every N steps; the final save stays the caller's job.
        """
        import time as _time

        from .checkpoint import save_checkpoint

        pending = sorted(hooks, key=lambda h: h[0])
        last_ckpt = self.step
        tic = _time.time()
        while self.step <= total_steps:
            while pending and self.step >= pending[0][0]:
                pending.pop(0)[1]()
            if self.device_sampler is not None:
                m = self.run_chunk()
            else:
                m = self.run_step()
            if (checkpoint_every and checkpoint_dir
                    and self.step - last_ckpt >= checkpoint_every):
                save_checkpoint(checkpoint_dir, self.state, self.step,
                                self.key, self.bucket, self.steady_march)
                last_ckpt = self.step
            if log_every and (self.step % log_every <
                              (self.steps_per_call if self.device_sampler else 1)):
                log_fn(
                    f"elapsed_time={_time.time() - tic:.2f}s | step={self.step} | "
                    f"loss={m['loss']:.5f} | psnr={m.get('psnr', 0):.2f} | "
                    f"n_rendering_samples={int(m['n_samples'])} | "
                    f"num_rays={int(m['num_rays'])} |"
                )
        return self.state
