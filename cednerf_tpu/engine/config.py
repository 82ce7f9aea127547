"""Per-dataset training/rendering presets + model flags.

Declarative replacement for the reference's per-dataset config code blocks
(train_real.py:86-182) and the shared CLI flags (opt.py:5-87). Values are
kept identical to the reference so convergence/parity comparisons are
meaningful; TPU-specific additions (sample budgets, marching caps, bucketed
batch shapes) are documented inline.
"""

import dataclasses
import math
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelFlags:
    """The opt.py model/loss flags (opt.py:5-87)."""

    use_div_offsets: bool = False      # -df
    use_feat_predict: bool = False     # -f
    use_weight_predict: bool = False   # -w
    use_time_embedding: bool = False   # -te
    use_time_attenuation: bool = False # -ta
    use_opacity_loss: bool = False     # -o
    distortion_loss: bool = False      # -d
    weight_rgbper: bool = False        # -wr
    acc_entropy_loss: bool = False     # -ae  (reference spells it 'entorpy')
    hash4motion: bool = False
    time_inject_before_sigma: bool = True
    grid_type: str = "hash3d"


@dataclasses.dataclass(frozen=True)
class SceneConfig:
    """Everything static about a training run (shapes, schedules, scene box)."""

    family: str                         # 'dnerf' | 'hypernerf' | 'dynerf'
    max_steps: int
    target_sample_batch_size: int       # valid-sample budget per step
    aabb: Tuple[float, ...]
    near_plane: float
    far_plane: float
    moving_step: float
    hash_dst_resolution: int
    grid_resolution: int
    grid_nlvl: int
    render_step_size: float
    alpha_thre: float
    cone_angle: float
    milestones: Tuple[int, ...]
    lr: float = 1e-2
    log2_hashmap_size: int = 21         # train_real.py:262
    # Encoder level/feature split. The reference uses 16 levels x 2 features
    # (model.py:242-252); 8x4 keeps the same 32-dim output and measured
    # equal quality on the synthetic gate (L16F2 eval 32.1 dB vs L8F4
    # 33.2 dB, tools/validate_synthetic.py) while halving the per-sample
    # gather/scatter row count — ~18% faster encoder fwd+bwd on v5e.
    hash_n_levels: int = 8
    hash_n_features: int = 4
    # encoder table-gradient accumulator dtype: bf16 removes the backward's
    # per-level [N, 64F] f32 convert copies and halves scatter read traffic
    # (the reference's tcnn accumulates hash grads in fp16); PSNR-gated on
    # the synthetic scene (tools/validate_synthetic.py)
    grad_accum_dtype: str = "bfloat16"
    # encoder table-grad scatter impl: "xla" | "pallas" | "onehot" | "auto"
    # | "fused" (ops/brick_grid.py _scatter_rows; "fused" runs the whole
    # level backward — lane math + VMEM accumulator — as one Pallas kernel,
    # ops/pallas_encoder.py interp_bwd_fused; pending v5e A/B via
    # tools/profile_pallas_scatter.py / profile_step.py)
    scatter_impl: str = "xla"
    # encoder interpolation impl: "xla" | "pallas" (all-levels forward lane
    # math in one Pallas kernel + per-level fused backward kernels; see
    # ops/brick_grid.py interp_impl)
    interp_impl: str = "xla"
    # brick-encoder per-level table-row cap; 16384 rows (8 MB fp32) keeps
    # tables + Pallas grad accumulators VMEM-resident. Larger caps (more
    # corner slots, less hash aliasing) are valid with scatter_impl="xla".
    max_table_rows: int = 16384
    # fine-level (>= level 5) brick-table row override: bigger fine tables
    # cut the brick-hash aliasing quantified in tools/collision_stats.py
    # at HBM (not VMEM) cost; levels over the VMEM bound use the XLA
    # scatter automatically. 0 = uniform cap.
    fine_table_rows: int = 0
    # first level fine_table_rows applies to (BrickGridSpec.fine_from_level;
    # default 5 targets the finest of 8 levels — lower it for narrow level
    # counts, e.g. 2 for the L4F8 split where the capacity-starved levels
    # are 2-3)
    fine_from_level: int = 5
    # Per-level cell-layout row guard: a hashed level whose CELL table
    # (rows*27) would exceed this keeps the brick layout — the v5e
    # scatter-add marginal cost degenerates ~10x past ~0.5M-row tables
    # (tools/profile_scatter_rows.py curve). Makes fine_table_rows
    # compatible with row_layout=cell.
    cell_rows_cap: int = 524288
    # re-gather encoder rows in the backward instead of saving the [N, 64F]
    # per-level residuals (ops/brick_grid.py remat_feats): trades ~0.5 ms
    # re-gather per level for ~4 GB residual HBM per 1M budget samples —
    # enable at target_sample_batch_size >= 2M
    remat_feats: bool = False
    # hashed-level hot-row layout: "brick" (64-corner rows) or "cell"
    # (per-cell 8-corner rows, 8x narrower per-sample lane math/gather/
    # scatter at one extra table-sized MXU expansion per level per step;
    # ops/brick_grid.py row_layout)
    row_layout: str = "brick"
    # budget-compaction impl: "rayfold" (gather-inverted sel build —
    # R+budget-row ops instead of the R*M-lattice cumsum+scatter;
    # bit-exact, +3.5% end-to-end on v5e, single-block only — falls back
    # otherwise), "xla" (lattice cumsum + unique-index scatter), or
    # "pallas" (single-pass MXU compaction, ops/pallas_compact.py)
    compact_impl: str = "rayfold"
    # per-slot assembly impl in the packed path: "cumsum" (ops/segments.py
    # segment_broadcast: delta scatter + cumsum; f32 re-association ~1e-5
    # on broadcast inputs) or "gather" (take by ray id — the v5e per-row
    # wall, ~4x the cost per instance at 1M slots). Measured 2026-08-19:
    # cumsum cuts the 262k step 94->90 ms and the 1M step ~420->397 ms;
    # bench 2.53M samples/s at 1M vs 2.15M for the gather-era default.
    assembly_impl: str = "cumsum"
    # packed compositing (renderer.render_rays_budget_packed): transmittance
    # + accumulation run on the [budget] buffer via segment cumsums - no
    # [R*M, C] scatter-back or [R, M] composite arrays in the train program
    packed_render: bool = True
    init_batch_size: int = 1024
    # TPU additions -----------------------------------------------------
    max_march_steps: int = 1024         # candidate steps per ray during marching
    # steady-state lattice slots with empty-space skipping (0 = off): after
    # occupancy warmup, each ray's lattice start advances past leading
    # unoccupied space (ops/occupancy.py advance_t_min — a pooled coarse
    # probe over the full max_march_steps span), so the per-ray lattice
    # shrinks to this many slots. Sample positions are identical to the
    # full lattice's; rays whose occupied span exceeds the shrunken lattice
    # are loss-masked via `complete` (telemetry: complete_frac). Every
    # lattice-proportional cost (compaction sel build, occupancy gathers,
    # position math — ~67 ms/step of the 1M-budget trace at 1024 slots)
    # scales down by steady_march_steps/max_march_steps. Uniform-step
    # configs only (cone_angle == 0); ignored otherwise.
    steady_march_steps: int = 0
    # shrink-from-full steady-march adaptation (round-4 inversion of the
    # fixed-lattice skip whose "+8%" was measured to be hidden truncation,
    # PERF_PLAN s25): the Trainer STARTS at the full lattice (no truncation
    # transient ever) and, once steady-state complete_frac holds at 1.0,
    # SHRINKS the lattice to the measured occupied-span maximum plus a
    # coarse-probe margin (span_slots telemetry). The existing doubling
    # auto-repair recovers if occupancy later grows. Uniform-step configs
    # with steady_march_steps == 0 only; an explicit steady_march_steps
    # pins the old behavior.
    steady_march_auto: bool = True
    occ_update_interval: int = 16       # nerfacc update_every_n_steps default
    occ_warmup_steps: int = 256
    occ_thre: float = 1e-2
    occ_ema_decay: float = 0.95
    train_bkgd_aug: str = "white"
    test_bkgd_aug: str = "white"
    dataset_factor: int = 1
    add_cam: bool = False
    eval_s_max: int = 256               # per-ray sample cap for eval rendering
    eval_chunk: int = 4096              # rays per eval chunk (lattice path)
    # rays per chunk for the segment-compacted eval path: its per-chunk
    # fixed costs (coarse probes, pooled grid, dispatch round-trip) amortize
    # over much larger chunks than the lattice marcher's could afford
    eval_chunk_seg: int = 32768
    # the ray-count feedback targets demand = this fraction of sample_budget,
    # leaving headroom so budget overflow (dropped rays) stays rare
    budget_headroom: float = 0.95
    # ray blocks compacted independently (engine/renderer.py compact_select);
    # set to the device count so the compaction stays shard-local on a mesh
    compact_blocks: int = 1
    # two-stage segment marching (renderer.march_segments): test occupancy
    # per march_seg-step segment against a pooled coarse grid, compact
    # segments, then fine-test only inside selected segments — fine-lattice
    # work shrinks from R*max_march_steps to ~budget*seg_overcommit.
    # 0 = off (dense lattice path). Applies to the steady-state scanned loop
    # only (warmup's dense grid would truncate every segment) and requires
    # grid_nlvl == 1 + packed_render (see march_segments docstring).
    march_seg: int = 0
    seg_overcommit: float = 1.5
    seg_pool: int = 4
    # steady-state per-ray candidate cap (renderer.pack_candidates): packs
    # each ray's valid candidates into this many slots before cross-ray
    # compaction, shrinking lattice-proportional ops by
    # max_march_steps/steady_s_cap. Measured a net LOSS on v5e (+5 ms/step:
    # the take_along_axis repack is per-element-gather-bound and costs more
    # than the lattice shrink saves), so 0 (off) by default; kept as an
    # option for hardware where lattice-width ops dominate.
    steady_s_cap: int = 0

    @property
    def sample_budget(self) -> int:
        """Fixed field-evaluation batch per train step (compacted samples).

        Matches the reference's dynamic-batching sample target
        (train_real.py:354-360); the field always evaluates exactly this many
        sample slots, and the host adapts the *ray count* so the valid-sample
        demand tracks it — one steady-state XLA program per ray bucket.
        """
        return self.target_sample_batch_size

    def ray_buckets(self) -> Tuple[int, ...]:
        """Allowed ray counts: a ~2^(1/8) geometric ladder of multiples of 64.

        Bucket utilization of the fixed sample budget is headroom/ratio ..
        headroom, so the ratio directly bounds wasted field-eval slots
        (2^(1/8) => >=87% at headroom 0.95; the earlier 2^(1/4) ladder
        floored at 80% and benched ~83% mean utilization). Each bucket is
        one compiled program; runs visit only the few buckets their demand
        drifts through (cached on disk across runs).

        The floor keeps warmup legal: with a fully dense grid every candidate
        is valid, so demand = n_rays * max_march_steps must be able to sit at
        ~the budget. Rounding the floor DOWN (not up) to the 64-multiple
        keeps warmup demand <= budget, so warmup steps never sit in routine
        last-ray truncation (they'd be loss-masked, starving those rays).
        """
        lo = max((self.sample_budget // self.max_march_steps) // 64 * 64, 64)
        hi = self.sample_budget // 16  # cap: >=16 expected samples/ray
        out = [lo]
        while True:
            n = -(-int(out[-1] * 2 ** 0.125) // 64) * 64
            if n > hi:
                break
            out.append(n)
        return tuple(out)

    def pick_ray_bucket(self, mean_samples_per_ray: float) -> int:
        """Largest bucket whose expected demand fits inside the headroom."""
        desired = self.budget_headroom * self.sample_budget / max(
            mean_samples_per_ray, 1.0)
        buckets = self.ray_buckets()
        for n in reversed(buckets):
            if n <= desired:
                return n
        return buckets[0]


def _milestones(max_steps: int, extra_56: bool = False) -> Tuple[int, ...]:
    ms = [max_steps // 2, max_steps * 3 // 4]
    if extra_56:
        ms.append(max_steps * 5 // 6)
    ms.append(max_steps * 9 // 10)
    return tuple(ms)


def dnerf_config(max_steps: int = 20000) -> SceneConfig:
    """D-NeRF synthetic preset (train_real.py:86-117)."""
    return SceneConfig(
        family="dnerf",
        max_steps=max_steps,
        target_sample_batch_size=1 << 18,
        aabb=(-1.5, -1.5, -1.5, 1.5, 1.5, 1.5),
        near_plane=0.0,
        far_plane=1e10,
        moving_step=1e-4,
        hash_dst_resolution=1024,
        grid_resolution=128,
        grid_nlvl=1,
        render_step_size=5e-3,
        alpha_thre=0.0,
        cone_angle=0.0,
        milestones=_milestones(max_steps),
        # aabb diagonal 3*sqrt(3) / 5e-3 ~= 1040 uniform steps
        max_march_steps=1024,
        train_bkgd_aug="white",
        test_bkgd_aug="white",
    )


def hypernerf_config(scene: str, max_steps: int = 20000) -> SceneConfig:
    """HyperNeRF real-capture preset (train_real.py:119-149)."""
    return SceneConfig(
        family="hypernerf",
        max_steps=max_steps,
        target_sample_batch_size=1 << 18,
        aabb=(-1.0, -1.0, -1.0, 1.0, 1.0, 1.0),
        near_plane=0.2,
        far_plane=1e10,
        moving_step=1.0 / 4096,
        hash_dst_resolution=4096,
        grid_resolution=128,
        grid_nlvl=2,
        render_step_size=1e-3,
        alpha_thre=1e-2,
        cone_angle=0.004,
        milestones=_milestones(max_steps),
        max_march_steps=1024,
        train_bkgd_aug="black",
        test_bkgd_aug="black",
        dataset_factor=2,
        add_cam="vrig" in scene,
    )


def dynerf_config(max_steps: int = 40000) -> SceneConfig:
    """DyNeRF multi-camera video preset (train_real.py:151-182)."""
    grid_nlvl = 4
    return SceneConfig(
        family="dynerf",
        max_steps=max_steps,
        target_sample_batch_size=1 << 20,
        aabb=(-1.0, -1.0, -1.0, 1.0, 1.0, 1.0),
        near_plane=0.2,
        far_plane=1e10,
        moving_step=1.0 / (2048 * grid_nlvl),
        hash_dst_resolution=2048 * grid_nlvl,
        grid_resolution=128,
        grid_nlvl=grid_nlvl,
        render_step_size=1e-3,
        alpha_thre=1e-2,
        cone_angle=0.004,
        milestones=_milestones(max_steps, extra_56=True),
        # outer level aabb is +-8; geometric step growth bounds the count
        max_march_steps=1536,
        train_bkgd_aug="random",
        test_bkgd_aug="black",
        dataset_factor=4,
    )


def config_for_scene(scene: str, max_steps: Optional[int] = None) -> SceneConfig:
    """Scene-name -> preset dispatch (train_real.py:86,119,151)."""
    from ..datasets import DNERF_SYNTHETIC_SCENES, DYNERF_SCENES, HYPERNERF_SCENES

    if scene.startswith("procedural"):
        # dataset-free analytic scenes (datasets/procedural.py)
        return dnerf_config(max_steps or 2000)
    if scene in DNERF_SYNTHETIC_SCENES:
        return dnerf_config(max_steps or 20000)
    if scene in HYPERNERF_SCENES:
        return hypernerf_config(scene, max_steps or 20000)
    if scene in DYNERF_SCENES:
        return dynerf_config(max_steps or 40000)
    raise ValueError(f"unknown scene: {scene}")
