"""Rendering orchestration over padded ray batches.

TPU-native replacement for the reference's `render_image` (train path,
cednerf/utils.py:46-150) and `render_image_test` (inference path,
cednerf/utils.py:153-318). One field query evaluates all padded sample slots;
the alive-ray early-termination loop of the CUDA inference path becomes a
single dense pass over occupancy-compacted samples (most of what early
termination saves is already removed by the occupancy mask + per-ray cap).
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.occupancy import (OccGridState, RayCandidates, RaySamples,
                             coarse_lookup, march_candidates, march_rays,
                             march_t_lattice, occupancy_lookup,
                             pooled_binaries, ray_aabb_intersect)
from ..ops.render import composite, reduce_along_rays, render_weights_from_density
from ..ops.segments import segment_broadcast
from .config import SceneConfig


class PackedSamples(NamedTuple):
    """A budgeted, ray-major packed sample batch ready for field evaluation.

    Per-slot ([budget]-shaped): pos [B,3], dirs [B,3], ts [B], t_starts [B],
    dts [B], valid [B] bool (False = padding slot), ray [B] i32 (owning ray).
    Per-ray ([R]-shaped): starts/counts (each ray's contiguous segment in the
    packed buffer), complete (no valid sample of the ray was dropped).
    n_valid: the pre-truncation valid-sample demand (host batch feedback).
    """

    pos: jnp.ndarray
    dirs: jnp.ndarray
    ts: jnp.ndarray
    t_starts: jnp.ndarray
    dts: jnp.ndarray
    valid: jnp.ndarray
    ray: jnp.ndarray
    starts: jnp.ndarray
    counts: jnp.ndarray
    complete: jnp.ndarray
    n_valid: jnp.ndarray


class RenderResult(NamedTuple):
    rgb: jnp.ndarray        # [R, 3]
    opacity: jnp.ndarray    # [R, 1]
    depth: jnp.ndarray      # [R, 1]
    n_samples: jnp.ndarray  # scalar: valid rendered samples
    extras: dict


def compact_select(valid, budget: int, n_blocks: int = 1):
    """Select up to `budget` valid candidates in flat (ray-major) order.

    valid: [R, M] bool. Returns:
      sel  [budget] i32 — flat candidate indices (ascending within each
           block); R*M marks an unused slot;
      kept [R, M] bool — valid candidates that made the cut. Overflow drops
           the *last* rays' samples of a block, which the train loss
           neutralizes with the per-ray `complete` flag;
      rank [R, M] i32 — each kept candidate's row in the compacted buffer
           (garbage where not kept): the inverse of `sel`.

    Built from one cumsum + one scatter of unique indices — the
    compile-friendly form (jnp.nonzero's path and unsorted scatters were
    pathological on TPU). `n_blocks > 1` splits the rays into contiguous
    blocks, each compacted to budget/n_blocks independently: with blocks
    aligned to a ray-sharded device mesh the cumsum/scatter stay
    shard-local instead of forcing a global collective.
    """
    r, m = valid.shape
    n = r * m
    assert r % n_blocks == 0 and budget % n_blocks == 0
    nb = n // n_blocks
    bb = budget // n_blocks

    def one_block(flat, blk):
        dest = jnp.cumsum(flat.astype(jnp.int32)) - 1
        write = flat & (dest < bb)
        # Non-written entries get distinct out-of-bounds slots so the scatter
        # can legally claim unique indices (mode="drop" discards them).
        scat = jnp.where(write, dest, bb + jnp.arange(nb, dtype=jnp.int32))
        sel = (
            jnp.full((bb,), nb, jnp.int32)
            .at[scat]
            .set(jnp.arange(nb, dtype=jnp.int32), mode="drop",
                 unique_indices=True)
        )
        return sel, write, dest + blk * bb

    sel_b, write_b, rank_b = jax.vmap(one_block)(
        valid.reshape(n_blocks, nb), jnp.arange(n_blocks, dtype=jnp.int32))
    base = (jnp.arange(n_blocks, dtype=jnp.int32) * nb)[:, None]
    sel = jnp.where(sel_b < nb, sel_b + base, n).reshape(-1)
    return sel, write_b.reshape(r, m), rank_b.reshape(r, m)


def compact_select_rayfold(valid, budget: int):
    """compact_select (single block) without any lattice-sized sequential op.

    The original form pays two ops proportional to the R*M candidate
    lattice (~8x the budget at steady-state occupancy): a flat [R*M]
    cumsum and a scatter with R*M source rows (~40 ms/step at the 1M-budget
    bench shapes, trace 2026-08-19). This form folds the lattice's minor
    axis into lanes and inverts the compaction by GATHER per budget slot:

      * per-ray valid counts/ranks come from a lane-axis cumsum ([R, M],
        vectorized — no sequential scan);
      * global ray offsets from an [R]-sized cumsum;
      * each ray's kept lane positions from a stable lane argsort (the
        same [R, M] form pack_candidates uses);
      * sel[b] for each of the `budget` output slots by two 1M-row
        gathers (slot -> owning ray via a delta scatter of R rows + one
        [budget] cumsum; slot -> lane via the argsort table).

    Sequential/scatter work drops from R*M rows to R + budget rows.
    Bit-identical outputs to compact_select(valid, budget, n_blocks=1)
    (tests/test_renderer.py::test_compact_select_rayfold_parity).
    """
    r, m = valid.shape
    n = r * m
    inc = jnp.cumsum(valid.astype(jnp.int32), axis=-1)       # [R, M] lanes
    counts_all = inc[:, -1]                                  # [R]
    ray_start = jnp.cumsum(counts_all) - counts_all          # [R] exclusive
    rank = ray_start[:, None] + inc - 1                      # [R, M]
    kept = valid & (rank < budget)
    # lane index of each ray's i-th valid candidate (valid lanes first,
    # original order preserved)
    order = jnp.argsort(jnp.logical_not(valid), axis=-1, stable=True)
    # slot -> owning ray: +1 at every ray's (clamped) start, cumsum, -1.
    # Zero-count rays share their start with the next ray; the trailing
    # (largest) ray index at a shared start is the one that owns the slots.
    starts_c = jnp.minimum(ray_start, budget).astype(jnp.int32)
    ray_id = jnp.cumsum(
        jnp.zeros((budget,), jnp.int32).at[starts_c].add(
            1, mode="drop")) - 1                             # [B]
    slot_start = jnp.take(starts_c, ray_id)                  # [B]
    lane = jnp.take(
        order.reshape(-1),
        ray_id * m + (jnp.arange(budget, dtype=jnp.int32) - slot_start),
    )
    total = jnp.minimum(jnp.sum(counts_all), budget)
    used = jnp.arange(budget, dtype=jnp.int32) < total
    sel = jnp.where(used, ray_id * m + lane, n)
    return sel, kept


def _ray_info(origins, viewdirs, timestamps):
    """[R, 7] per-ray slot-gather source: origin | viewdir | timestamp."""
    r = origins.shape[0]
    ts_full = jnp.broadcast_to(jnp.reshape(timestamps, (-1,))[:r], (r,))
    return jnp.concatenate([origins, viewdirs, ts_full[:, None]], axis=-1)


def _compact_sel_kept(valid, budget: int, n_blocks: int, impl: str):
    """compact_select minus the `rank` output, dispatched by impl.

    "pallas" runs the single-pass MXU compaction (ops/pallas_compact.py)
    when its preconditions hold (single block, lattice < 2^24); it is
    bit-compatible with the XLA path.
    """
    if impl == "rayfold" and n_blocks == 1:
        return compact_select_rayfold(valid, budget)
    if impl == "pallas" and n_blocks == 1 and budget <= (2 << 20):
        r, m = valid.shape
        if r * m < (1 << 24) and (r * m) % 8 == 0:
            from ..ops.pallas_compact import compact_select_pallas
            return compact_select_pallas(valid, budget)
    sel, kept, _ = compact_select(valid, budget, n_blocks=n_blocks)
    return sel, kept


# NOTE(perf): a scatter-free "gather by rank" expansion of the compacted
# results back to the lattice (dense[i] = packed[cumsum(kept)-1], custom VJP
# gathering by sel) was tried and measured SLOWER end-to-end (+22 ms/step):
# the gather runs per lattice slot (R*M = 1.77M tiny rows) while the scatter
# below runs per budget row (262k) — in-program, per-row counts dominate.


def pack_candidates(cand: RayCandidates, s_cap: int):
    """Per-ray compaction of valid candidates into the first `s_cap` slots.

    At steady-state occupancy only ~10-15% of the [R, max_march_steps]
    candidate lattice is valid; packing shrinks every downstream
    lattice-proportional op (compaction cumsum, scatter-back buffer, render
    scans) by max_march_steps / s_cap. Returns (packed RayCandidates
    [R, s_cap], fits [R] bool — False where a ray had more than s_cap valid
    candidates and was truncated; the train loss masks those rays out via
    the `complete` flag, like budget overflow).

    Not used during occupancy warmup: a dense grid makes every candidate
    valid, which would truncate (and so silence) every ray.
    """
    order = jnp.argsort(jnp.logical_not(cand.valid), axis=-1,
                        stable=True)[:, :s_cap]
    take = lambda a: jnp.take_along_axis(a, order, axis=-1)
    packed = RayCandidates(t_starts=take(cand.t_starts), dts=take(cand.dts),
                           valid=take(cand.valid), covered=cand.covered)
    fits = jnp.sum(cand.valid, axis=-1) <= s_cap
    return packed, fits


def render_rays_budget(
    field,
    params,
    origins,
    viewdirs,
    cand: RayCandidates,
    timestamps,
    render_bkgd,
    occ_mean: Optional[jnp.ndarray] = None,
    *,
    budget: int,
    alpha_thre: float = 0.0,
    train: bool = True,
    n_blocks: int = 1,
    ray_complete: Optional[jnp.ndarray] = None,
) -> RenderResult:
    """Budgeted train-path rendering: evaluate the field on at most `budget`
    valid marching candidates (cross-ray compaction), scatter the results back
    to the dense [R, M] lattice, and composite there.

    This is the TPU replacement for the reference's dynamic ray batching
    (train_real.py:354-360): the field-evaluation shape is *fixed* at `budget`
    regardless of scene occupancy, so XLA compiles one steady-state program;
    the host adapts the ray count so the valid-candidate demand tracks the
    budget. extras["complete"] is 1.0 for rays none of whose valid samples
    were dropped by the budget — the loss masks out incomplete rays.
    """
    r, m = cand.valid.shape
    n = r * m
    sel, kept, rank = compact_select(cand.valid, budget, n_blocks=n_blocks)
    sel_valid = sel < n
    sel_c = jnp.minimum(sel, n - 1)
    srt = n_blocks == 1  # sel ascending only in the single-block layout
    ray = sel_c // m

    # Pack per-ray and per-candidate inputs so assembly is 2 row gathers
    # instead of 5 (takes are per-row overhead-bound; none of these need
    # gradients — marching inputs are constants w.r.t. parameters).
    ri = jnp.take(_ray_info(origins, viewdirs, timestamps), ray, axis=0,
                  indices_are_sorted=srt)
    o, d, ts = ri[:, 0:3], ri[:, 3:6], ri[:, 6]
    tpack = jnp.stack(
        [cand.t_starts.reshape(-1), cand.dts.reshape(-1)], axis=-1)  # [n, 2]
    tv = jnp.take(tpack, sel_c, axis=0, indices_are_sorted=srt)
    t0s, dts = tv[:, 0], tv[:, 1]
    pos = o + d * (t0s + 0.5 * dts)[:, None]

    rgb_c, res_c = field.apply(params, pos, ts[:, None], d, return_internal=train)

    # Pack per-sample outputs into one row and scatter back once. Channel
    # budget matters: the dense buffer is [R*M, C] fp32.
    cols = [res_c["density"].astype(jnp.float32).reshape(-1, 1),
            rgb_c.astype(jnp.float32)]
    layout = {"density": (0, 1), "rgb": (1, 4)}
    off = 4
    internal_c = res_c.get("internal") if train else None
    if internal_c is not None:
        if "latent_losses" in internal_c:
            # channel-mean first: mean_{rays,chan}(sum_s w*h[s,c]) ==
            # mean_rays(sum_s w * mean_c h) — a [B,1] scalar per sample
            # instead of a [B, 32] block through the scatter.
            cols.append(jnp.mean(internal_c["latent_losses"], axis=-1,
                                 keepdims=True).astype(jnp.float32))
            layout["latent"] = (off, off + 1)
            off += 1
        if "weight_losses" in internal_c:
            cols.append(internal_c["weight_losses"].astype(jnp.float32))
            layout["p_weight"] = (off, off + 1)
            off += 1
            cols.append(internal_c["selector"].astype(jnp.float32)[:, None])
            layout["selector"] = (off, off + 1)
            off += 1
    packed = jnp.concatenate(cols, axis=-1) * sel_valid[:, None]
    # Unused sel slots get distinct out-of-bounds rows -> unique (and sorted
    # in the single-block layout).
    scat = jnp.where(sel_valid, sel,
                     n + jnp.arange(budget, dtype=jnp.int32))
    dense = (
        jnp.zeros((n, packed.shape[-1]), jnp.float32)
        .at[scat]
        .set(packed, mode="drop", unique_indices=True, indices_are_sorted=srt)
    )

    def col(name):
        lo, hi = layout[name]
        return dense[:, lo:hi]

    sigmas = col("density").reshape(r, m)
    rgbs = col("rgb").reshape(r, m, 3)

    mask = kept
    if alpha_thre > 0:
        thre = alpha_thre if occ_mean is None else jnp.minimum(alpha_thre, occ_mean)
        alpha_raw = 1.0 - jnp.exp(-jax.lax.stop_gradient(sigmas) * cand.dts)
        mask = mask & (alpha_raw > thre)

    t_starts, t_ends = cand.t_starts, cand.t_ends
    weights, trans, alphas = render_weights_from_density(
        t_starts, t_ends, sigmas, mask
    )
    rgb, opacity, depth = composite(
        weights, rgbs, t_starts, t_ends, mask, render_bkgd
    )

    extras = {
        "weights": weights,
        "trans": trans,
        "alphas": alphas,
        "sigmas": sigmas,
        "rgbs": rgbs,
        "mask": mask,
        "t_starts": t_starts,
        "t_ends": t_ends,
        # rays whose valid samples all survived the budget (loss mask);
        # ray_complete ANDs in upstream truncation (pack_candidates) and
        # cand.covered ANDs in lattice-span truncation (empty-space skip)
        "complete": (
            jnp.logical_not(
                jnp.any(cand.valid & jnp.logical_not(kept), axis=-1))
            & (True if ray_complete is None else ray_complete)
            & (True if cand.covered is None else cand.covered)
        ).astype(jnp.float32),
        # untruncated demand, for the host's ray-count feedback
        "n_valid": jnp.sum(cand.valid),
    }
    if internal_c is not None:
        if "latent" in layout:
            extras["latent_losses"] = reduce_along_rays(
                col("latent").reshape(r, m, 1), mask,
                weights=jax.lax.stop_gradient(weights), reduce="sum",
            )
        if "p_weight" in layout:
            from ..models.field import huber

            wl = huber(col("p_weight").reshape(r, m), trans) \
                * col("selector").reshape(r, m)
            extras["weight_losses"] = reduce_along_rays(
                wl[..., None], mask, weights=weights, reduce="mean"
            )

    n_samples = jnp.sum(mask)
    return RenderResult(rgb=rgb, opacity=opacity, depth=depth,
                        n_samples=n_samples, extras=extras)


def _block_starts(counts, budget: int, n_blocks: int):
    """Per-ray packed-buffer segment starts from per-ray counts ([R] i32)."""
    r = counts.shape[0]
    rb = r // n_blocks
    bb = budget // n_blocks
    cb = counts.reshape(n_blocks, rb)
    starts = (jnp.cumsum(cb, axis=-1) - cb
              + (jnp.arange(n_blocks, dtype=jnp.int32) * bb)[:, None]
              ).reshape(-1)                                       # [R]
    # block overflow can leave starts past the block's slots; clamp so the
    # boundary gathers stay in range (those rays are complete=0 anyway)
    return jnp.minimum(starts, budget)


def pack_budget_samples(
    origins,
    viewdirs,
    cand: RayCandidates,
    timestamps,
    *,
    budget: int,
    n_blocks: int = 1,
    ray_complete: Optional[jnp.ndarray] = None,
    compact_impl: str = "xla",
    assembly_impl: str = "gather",
    uniform_dt: Optional[float] = None,
) -> PackedSamples:
    """Cross-ray compaction of a dense candidate lattice into PackedSamples.

    Slots are ray-major (compact_select's sel is ascending per block), so a
    ray's samples form one contiguous [starts, starts+counts) segment.
    """
    r, m = cand.valid.shape
    n = r * m
    sel, kept = _compact_sel_kept(cand.valid, budget, n_blocks, compact_impl)
    sel_valid = sel < n
    sel_c = jnp.minimum(sel, n - 1)
    srt = n_blocks == 1
    ray = sel_c // m

    counts = jnp.sum(kept, axis=-1).astype(jnp.int32)            # [R]
    starts = _block_starts(counts, budget, n_blocks)
    if assembly_impl == "cumsum":
        # segment broadcast (delta scatter + cumsum) instead of a [B]-row
        # take by ray id: ~4x cheaper at 1M slots (tools/profile_layouts.py)
        cols = _ray_info(origins, viewdirs, timestamps)
        if uniform_dt is not None:
            # uniform step schedule (cone_angle == 0): the lattice is
            # t0[r, j] = t_min[r] + j*dt with per-RAY jitter baked into
            # t_min, so per-slot t reconstructs from the broadcast t_min +
            # the slot's lattice column — no [B]-row gather from the
            # [R*M, 2] t lattice at all. AABB-miss rays can carry huge
            # slab t_min (~1e10); broadcasting telescopes first
            # differences through an f32 cumsum, so one outlier would
            # shift every later ray's reconstructed t by ~ulp(outlier).
            # Zero the column for rays with no kept samples (their slots
            # don't exist; unit-scale values keep the telescoping exact).
            tmin = jnp.where(counts > 0, cand.t_starts[:, 0], 0.0)
            cols = jnp.concatenate([cols, tmin[:, None]], axis=-1)
        ri = segment_broadcast(cols, starts, budget, n_blocks)
    else:
        ri = jnp.take(_ray_info(origins, viewdirs, timestamps), ray, axis=0,
                      indices_are_sorted=srt)
    o, d, ts = ri[:, 0:3], ri[:, 3:6], ri[:, 6]
    if assembly_impl == "cumsum" and uniform_dt is not None:
        j = (sel_c % m).astype(jnp.float32)
        t0s_p = ri[:, 7] + j * jnp.float32(uniform_dt)
        dts_p = jnp.full((budget,), uniform_dt, jnp.float32)
    else:
        tpack = jnp.stack(
            [cand.t_starts.reshape(-1), cand.dts.reshape(-1)], axis=-1)
        tv = jnp.take(tpack, sel_c, axis=0, indices_are_sorted=srt)
        t0s_p, dts_p = tv[:, 0], tv[:, 1]
    pos = o + d * (t0s_p + 0.5 * dts_p)[:, None]
    complete = (
        jnp.logical_not(jnp.any(cand.valid & jnp.logical_not(kept), axis=-1))
        & (True if ray_complete is None else ray_complete)
        & (True if cand.covered is None else cand.covered)
    )
    return PackedSamples(
        pos=pos, dirs=d, ts=ts, t_starts=t0s_p, dts=dts_p, valid=sel_valid,
        ray=ray, starts=starts, counts=counts, complete=complete,
        n_valid=jnp.sum(cand.valid),
    )


def march_segments(
    occ_state: OccGridState,
    origins,
    viewdirs,
    timestamps,
    *,
    budget: int,
    near_plane: float,
    far_plane: float,
    render_step_size: float,
    cone_angle: float = 0.0,
    max_march_steps: int = 1024,
    seg: int = 8,
    overcommit: float = 1.5,
    pool: int = 4,
    n_blocks: int = 1,
    stratified_key=None,
    compact_impl: str = "xla",
) -> PackedSamples:
    """Two-stage (segment -> sample) budgeted marching into PackedSamples.

    The dense path (march_candidates + pack_budget_samples) pays occupancy
    gathers, position math, and a compaction cumsum on the FULL [R, M]
    candidate lattice (~7x the budget at steady state). This path:

      1. tests occupancy per `seg`-step SEGMENT against a pooled+dilated
         coarse grid ([R, M/seg] lattice; a conservative superset — see
         ops/occupancy.py pooled_binaries), and compacts the occupied
         segments to a fixed `budget*overcommit/seg` buffer;
      2. evaluates fine per-sample positions + occupancy only INSIDE the
         selected segments and compacts those to the final `budget`.

    Fine lattice work therefore shrinks from R*M to ~budget*overcommit.
    Slot order stays ray-major/t-ascending (both compactions are ascending
    per block), so the result composites identically to the dense path.

    Correctness scope: single-level occupancy grids (asserted) and uniform
    step sizes (cone_angle == 0; with cone growth a far segment's half-span
    can exceed the pooled grid's dilated reach and the coarse test stops
    being a superset — engine/train.py gates on this). With nested
    levels a segment straddling a level boundary could have samples whose
    containing level differs from the tested endpoint's, and the coarse test
    would not be a strict superset; the dense path remains the multi-level
    fallback (engine/train.py picks by cfg.grid_nlvl).
    """
    assert occ_state.levels == 1, "march_segments: single-level grids only"
    assert max_march_steps % seg == 0
    r = origins.shape[0]
    m = max_march_steps
    ms = m // seg
    nseg = r * ms
    # segment-slot budget: multiple of (8 * n_blocks) for clean blocking
    sb = max(int(budget * overcommit) // seg, n_blocks * 8)
    sb = -(-sb // (8 * n_blocks)) * (8 * n_blocks)

    t0, dt, t_max = march_t_lattice(
        occ_state, origins, viewdirs, near_plane=near_plane,
        far_plane=far_plane, render_step_size=render_step_size,
        cone_angle=cone_angle, max_march_steps=max_march_steps,
        stratified_key=stratified_key,
    )

    # ---- stage A: coarse segment test + segment compaction ----
    coarse = pooled_binaries(occ_state, pool=pool, dilate=1)
    # Probe the coarse grid at the midpoint of the segment's t-range CLIPPED
    # to t_max: a raw segment midpoint can lie past the AABB exit (outside
    # every level -> coarse_lookup False) while earlier samples of the same
    # segment are still valid — clipping keeps the probe inside the AABB and
    # within half a (clipped) segment of every valid sample, preserving the
    # dilation superset bound.
    t_lo = t0[:, ::seg]                                          # [R, Ms]
    t_hi = t0[:, seg - 1::seg] + dt[:, seg - 1::seg]
    t_hi = jnp.maximum(jnp.minimum(t_hi, t_max[:, None]), t_lo)
    tm_seg = 0.5 * (t_lo + t_hi)                                 # [R, Ms]
    pos_seg = origins[:, None, :] + viewdirs[:, None, :] * tm_seg[..., None]
    seg_valid = ((t_lo < t_max[:, None])
                 & coarse_lookup(occ_state, coarse, pos_seg))    # [R, Ms]
    seg_sel, seg_kept = _compact_sel_kept(seg_valid, sb, n_blocks,
                                          compact_impl)
    seg_ok = seg_sel < nseg
    seg_c = jnp.minimum(seg_sel, nseg - 1)
    srt = n_blocks == 1
    seg_ray = seg_c // ms                                        # [SB]

    ri = jnp.take(_ray_info(origins, viewdirs, timestamps), seg_ray, axis=0,
                  indices_are_sorted=srt)
    # per-segment t block: one [SB, 2*seg] row gather
    tl = jnp.concatenate(
        [t0.reshape(nseg, seg), dt.reshape(nseg, seg)], axis=-1)
    tv = jnp.take(tl, seg_c, axis=0, indices_are_sorted=srt)
    t0_s, dt_s = tv[:, :seg], tv[:, seg:]                        # [SB, seg]

    # ---- stage B: fine per-sample test + sample compaction ----
    pos_s = (ri[:, None, 0:3]
             + ri[:, None, 3:6] * (t0_s + 0.5 * dt_s)[..., None])  # [SB,seg,3]
    tmax_s = jnp.take(t_max, seg_ray, indices_are_sorted=srt)
    fine_valid = (occupancy_lookup(occ_state, pos_s)
                  & (t0_s < tmax_s[:, None]) & seg_ok[:, None])  # [SB, seg]
    n2 = sb * seg
    sel2, kept2 = _compact_sel_kept(fine_valid, budget, n_blocks,
                                    compact_impl)
    ok2 = sel2 < n2
    c2 = jnp.minimum(sel2, n2 - 1)
    sidx = c2 // seg                                             # [B] -> SB

    spack = jnp.concatenate(
        [pos_s.reshape(n2, 3), t0_s.reshape(n2, 1), dt_s.reshape(n2, 1)],
        axis=-1)                                                 # [n2, 5]
    sv = jnp.take(spack, c2, axis=0, indices_are_sorted=srt)
    pos_p, t0_p, dt_p = sv[:, 0:3], sv[:, 3], sv[:, 4]
    rpack = jnp.concatenate(
        [ri[:, 3:7], seg_ray[:, None].astype(jnp.float32)], axis=-1)
    rv = jnp.take(rpack, sidx, axis=0, indices_are_sorted=srt)   # [B, 5]
    d_p, ts_p = rv[:, 0:3], rv[:, 3]
    ray_p = rv[:, 4].astype(jnp.int32)

    # ---- per-ray layout + accounting ----
    cnt_seg = jnp.sum(kept2, axis=-1).astype(jnp.int32)          # [SB]
    counts = jnp.zeros((r,), jnp.int32).at[seg_ray].add(cnt_seg)
    starts = _block_starts(counts, budget, n_blocks)
    drop_a = jnp.any(seg_valid & jnp.logical_not(seg_kept), axis=-1)
    drop_b_seg = jnp.any(fine_valid & jnp.logical_not(kept2),
                         axis=-1).astype(jnp.int32)              # [SB]
    drop_b = jnp.zeros((r,), jnp.int32).at[seg_ray].max(drop_b_seg) > 0
    complete = jnp.logical_not(drop_a | drop_b)
    # demand feedback: fine-valid density extrapolated over truncated segs
    nv_fine = jnp.sum(fine_valid)
    segs_valid = jnp.sum(seg_valid)
    segs_kept = jnp.sum(seg_valid & seg_kept)
    n_valid = (nv_fine.astype(jnp.float32) * segs_valid.astype(jnp.float32)
               / jnp.maximum(segs_kept.astype(jnp.float32), 1.0)
               ).astype(jnp.int32)
    return PackedSamples(
        pos=pos_p, dirs=d_p, ts=ts_p, t_starts=t0_p, dts=dt_p, valid=ok2,
        ray=ray_p, starts=starts, counts=counts, complete=complete,
        n_valid=n_valid,
    )


def render_packed(
    field,
    params,
    ps: PackedSamples,
    render_bkgd,
    occ_mean: Optional[jnp.ndarray] = None,
    *,
    budget: int,
    alpha_thre: float = 0.0,
    train: bool = True,
    n_blocks: int = 1,
    assembly_impl: str = "gather",
) -> RenderResult:
    """Field evaluation + PACKED compositing on a PackedSamples batch: the
    transmittance scan and all per-ray accumulations run directly on the
    [budget] compacted buffer — no [R*M, C] dense scatter-back and no
    [R, M]-lattice composite arrays anywhere in the program.

    Mechanics (the nerfacc packed-rays design, rebuilt with XLA scans):
      * per-ray exclusive prefixes = global exclusive cumsum minus the
        ray-base prefix (one [R]-gather at segment starts) — block padding
        carries zeros, so cumsums pass through it unchanged;
      * per-ray sums = boundary differences of one [budget+1, C] exclusive
        cumsum (C = 5: w*rgb, w, w*t_mid);
      * f32 global cumsums: the running total reaches ~1e4, so boundary
        differences keep ~1e-3 absolute accuracy — comparable to the bf16
        compute noise of the field itself (gated by the dense-vs-packed
        equality test).

    extras carries packed per-slot fields (suffix `_p`) plus ray/starts/
    counts for the packed loss forms in ops/losses.py.
    """
    from ..utils.math import exclusive_cumsum

    ray, starts, counts = ps.ray, ps.starts, ps.counts
    t0s_p, dts_p = ps.t_starts, ps.dts
    rgb_c, res_c = field.apply(params, ps.pos, ps.ts[:, None], ps.dirs,
                               return_internal=train)

    sigmas_p = res_c["density"].astype(jnp.float32).reshape(-1)
    rgbs_p = rgb_c.astype(jnp.float32)

    valid_p = ps.valid
    if alpha_thre > 0:
        thre = alpha_thre if occ_mean is None else jnp.minimum(alpha_thre,
                                                               occ_mean)
        alpha_raw = 1.0 - jnp.exp(-jax.lax.stop_gradient(sigmas_p) * dts_p)
        valid_p = valid_p & (alpha_raw > thre)
    vf = valid_p.astype(jnp.float32)

    sdelta_p = sigmas_p * dts_p * vf
    excl_sd = exclusive_cumsum(sdelta_p, axis=0)                  # [B]

    # per-slot ray-base prefixes via one [R, 1] base gather. The exponent is
    # clamped at 0: a block's invalid tail slots carry ray = last-ray (their
    # clamped sel points at the lattice end), whose base prefix lies AFTER
    # them, and exp(+large) would make inf * (vf = 0) = NaN poison the
    # channel cumsums of every later block. Valid slots always sit at or
    # after their own ray's start, so the clamp is a no-op for them.
    base_sd = jnp.take(
        jnp.concatenate([excl_sd, jnp.sum(sdelta_p)[None]]), starts)
    if assembly_impl == "cumsum":
        base_b = segment_broadcast(base_sd, starts, budget, n_blocks)
    else:
        base_b = jnp.take(base_sd, ray)
    trans_p = jnp.exp(-jnp.maximum(excl_sd - base_b, 0.0))
    alphas_p = 1.0 - jnp.exp(-sdelta_p)
    weights_p = trans_p * alphas_p * vf

    # per-ray outputs: one C=5 exclusive cumsum + two boundary gathers
    t_mid_p = t0s_p + 0.5 * dts_p
    chans = jnp.concatenate(
        [weights_p[:, None] * rgbs_p,
         weights_p[:, None],
         (weights_p * t_mid_p)[:, None]], axis=-1)                # [B, 5]
    zx = jnp.cumsum(chans, axis=0)
    zx = jnp.concatenate([jnp.zeros((1, 5), jnp.float32), zx], axis=0)
    lo = jnp.take(zx, starts, axis=0)
    hi = jnp.take(zx, jnp.minimum(starts + counts, budget), axis=0)
    sums = hi - lo                                                # [R, 5]
    rgb = sums[:, 0:3]
    opacity = sums[:, 3:4]
    depth = sums[:, 4:5] / jnp.maximum(opacity, 1.1920929e-07)
    if render_bkgd is not None:
        rgb = rgb + render_bkgd * (1.0 - opacity)

    extras = {
        "packed": True,
        "weights_p": weights_p,
        "trans_p": trans_p,
        "sigmas_p": sigmas_p,
        "rgbs_p": rgbs_p,
        "t_starts_p": t0s_p,
        "dts_p": dts_p,
        "valid_p": vf,
        "ray": ray,
        "starts": starts,
        "counts": counts,
        "complete": ps.complete.astype(jnp.float32),
        "n_valid": ps.n_valid,
    }
    internal_c = res_c.get("internal") if train else None
    if internal_c is not None:
        if "latent_losses" in internal_c:
            # per-slot channel-mean huber; the packed loss form takes the
            # global complete-masked sum (== ray_mean of per-ray sums)
            extras["latent_p"] = jnp.mean(
                internal_c["latent_losses"], axis=-1).astype(jnp.float32)
        if "weight_losses" in internal_c:
            from ..models.field import huber

            wl = huber(internal_c["weight_losses"].astype(jnp.float32)[:, 0],
                       trans_p)
            extras["weight_loss_p"] = (
                wl * internal_c["selector"].astype(jnp.float32))

    n_samples = jnp.sum(vf)
    return RenderResult(rgb=rgb, opacity=opacity, depth=depth,
                        n_samples=n_samples, extras=extras)


def render_rays_budget_packed(
    field,
    params,
    origins,
    viewdirs,
    cand: RayCandidates,
    timestamps,
    render_bkgd,
    occ_mean: Optional[jnp.ndarray] = None,
    *,
    budget: int,
    alpha_thre: float = 0.0,
    train: bool = True,
    n_blocks: int = 1,
    ray_complete: Optional[jnp.ndarray] = None,
    compact_impl: str = "xla",
    assembly_impl: str = "gather",
    uniform_dt: Optional[float] = None,
) -> RenderResult:
    """pack_budget_samples + render_packed on a dense candidate lattice
    (the budgeted packed-compositing train path; see those functions)."""
    ps = pack_budget_samples(
        origins, viewdirs, cand, timestamps, budget=budget,
        n_blocks=n_blocks, ray_complete=ray_complete,
        compact_impl=compact_impl, assembly_impl=assembly_impl,
        uniform_dt=uniform_dt,
    )
    return render_packed(
        field, params, ps, render_bkgd, occ_mean, budget=budget,
        alpha_thre=alpha_thre, train=train,
        n_blocks=n_blocks, assembly_impl=assembly_impl,
    )


def render_rays(
    field,
    params,
    origins,
    viewdirs,
    samples: RaySamples,
    timestamps,
    render_bkgd,
    occ_mean: Optional[jnp.ndarray] = None,
    *,
    alpha_thre: float = 0.0,
    train: bool = False,
    compact_budget: Optional[int] = None,
) -> RenderResult:
    """Evaluate the field on padded samples and composite along rays.

    Args:
      origins/viewdirs: [R, 3]; samples: padded [R, S] intervals + mask.
      timestamps: [R, 1] per-ray times (train) or broadcastable scalar (eval).
      occ_mean: mean occupancy value — during training nerfacc clamps the
        alpha-pruning threshold by it (OccGridEstimator.sampling semantics).
      compact_budget: when set, the field is queried on at most this many
        sample slots. march_rays packs each ray's valid samples into its
        leading slots, so truncating the sample axis at ceil(budget / n_rays)
        implements the budget as an extra per-ray cap (deepest samples of
        over-long rays drop first) with zero data movement — the
        compile-friendly replacement for a nonzero/scatter compaction, whose
        XLA graph was pathological to compile.
    """
    r, s = samples.t_starts.shape
    if compact_budget is not None and compact_budget < r * s:
        s_eval = max(-(-compact_budget // r), 1)
        samples = RaySamples(
            t_starts=samples.t_starts[:, :s_eval],
            t_ends=samples.t_ends[:, :s_eval],
            mask=samples.mask[:, :s_eval],
        )
        r, s = samples.t_starts.shape
    t_mid = (samples.t_starts + samples.t_ends) / 2.0
    pos = origins[:, None, :] + viewdirs[:, None, :] * t_mid[..., None]  # [R,S,3]
    dirs = jnp.broadcast_to(viewdirs[:, None, :], (r, s, 3))
    t = jnp.broadcast_to(jnp.reshape(timestamps, (-1, 1, 1)), (r, s, 1))

    rgbs, sigma_results = field.apply(
        params,
        pos.reshape(-1, 3),
        t.reshape(-1, 1),
        dirs.reshape(-1, 3),
        return_internal=train,
    )
    rgbs = rgbs.reshape(r, s, 3)
    sigmas = sigma_results["density"].reshape(r, s).astype(jnp.float32)

    mask = samples.mask
    if alpha_thre > 0:
        # nerfacc prunes samples whose standalone alpha <= alpha_thre before
        # the transmittance scan (cednerf/utils.py:115-125 via
        # estimator.sampling); the threshold is clamped by the mean occupancy.
        thre = alpha_thre if occ_mean is None else jnp.minimum(alpha_thre, occ_mean)
        alpha_raw = 1.0 - jnp.exp(
            -jax.lax.stop_gradient(sigmas) * (samples.t_ends - samples.t_starts)
        )
        mask = mask & (alpha_raw > thre)

    weights, trans, alphas = render_weights_from_density(
        samples.t_starts, samples.t_ends, sigmas, mask
    )
    rgb, opacity, depth = composite(
        weights, rgbs, samples.t_starts, samples.t_ends, mask, render_bkgd
    )

    extras = {
        "weights": weights,
        "trans": trans,
        "alphas": alphas,
        "sigmas": sigmas,
        "rgbs": rgbs,
        "mask": mask,
        "t_starts": samples.t_starts,
        "t_ends": samples.t_ends,
    }
    if train and "internal" in sigma_results:
        internal = sigma_results["internal"]
        if "latent_losses" in internal:
            # weight-scaled per-ray sums (cednerf/render.py:105-113)
            latent = internal["latent_losses"].reshape(r, s, -1)
            extras["latent_losses"] = reduce_along_rays(
                latent, mask, weights=jax.lax.stop_gradient(weights), reduce="sum"
            )
        if "weight_losses" in internal:
            # huber(predicted per-sample weight, transmittance) * selector,
            # weight-scaled per-ray means (cednerf/render.py:114-124)
            from ..models.field import huber

            selector = internal["selector"].reshape(r, s)
            p_weight = internal["weight_losses"].reshape(r, s).astype(jnp.float32)
            wl = huber(p_weight, trans) * selector
            extras["weight_losses"] = reduce_along_rays(
                wl[..., None], mask, weights=weights, reduce="mean"
            )

    n_samples = jnp.sum(mask)
    return RenderResult(rgb=rgb, opacity=opacity, depth=depth, n_samples=n_samples,
                        extras=extras)


def _seg_dilate(cfg: SceneConfig, seg: int, pool: int) -> int:
    """Coarse-grid dilation that makes one segment-midpoint probe a superset
    test: every fine sample of the segment lies within `dilate` coarse cells
    of the probe's cell. Bound: half a segment plus a fine-cell diagonal,
    measured in level-0 coarse cells (the finest level binds; outer nested
    levels have 2x larger cells at the same pool)."""
    import math

    aabb = cfg.aabb
    size = min(aabb[3] - aabb[0], aabb[4] - aabb[1], aabb[5] - aabb[2])
    cell = size / cfg.grid_resolution
    coarse_cell = cell * pool
    reach = seg * cfg.render_step_size / 2.0 + math.sqrt(3.0) * cell
    return max(1, int(math.ceil(reach / coarse_cell)))


def make_eval_render_fn_seg(field, cfg: SceneConfig,
                            s_max: Optional[int] = None,
                            budget_per_ray: int = 64,
                            early_stop_eps: float = 1e-4,
                            seg: int = 8, pool: int = 4):
    """Segment-compacted eval renderer: the fast inference path.

    The lattice marcher (make_eval_render_fn budgeted path) pays occupancy
    gathers + scatters on the FULL [C, max_march_steps] candidate lattice
    per chunk — at 800x800 that is 665M lattice slots/frame and measured
    17-38 s/frame (results/r3s25/eval_800_*). This path replaces the
    per-sample lattice with nerfacc-style grid traversal economics
    (reference: traverse_grids + the alive-ray loop, cednerf/utils.py:229-308),
    rebuilt TPU-first:

      * occupancy is probed per `seg`-step SEGMENT against a pooled+dilated
        coarse grid (a conservative superset — ops/occupancy.py
        pooled_binaries), an 8x cut in probe rows; multi-level grids probe
        3 points per segment (the nested-level boundary caveat of
        march_segments, quantified by tests against the dense path);
      * occupied segments are cross-ray compacted (rayfold) to a fixed
        [budget_per_ray*C/seg] buffer per pass; fine per-sample occupancy
        and the field run ONLY inside selected segments;
      * compositing is packed (per-ray boundary differences of one [B+1, 5]
        cumsum) with per-ray transmittance carried across passes — no dense
        [C, M] scatter-back and no full-lattice transmittance scan;
      * a lax.while_loop repeats until every segment is consumed, a ray's
        transmittance drops below `early_stop_eps`, or its first `s_max`
        valid samples (exact, t-ordered — the viewer's samples slider) are
        rendered.

    Uniform-step schedules only (cone_angle == 0): segment t's reconstruct
    from the segment index, so no [C, M] t-lattice is ever materialized,
    and the pooled superset bound needs fixed-length segments.

    Round-5 additions (the r4s32 waste decomposition, docs/PERF_PLAN.md):

      * **demand-driven budget cascade** — the pass loop runs as a ladder of
        while_loops at shrinking slot budgets (full -> /4 -> /16). Phase k's
        loop condition keeps running only while the REMAINING demand
        (occupied segments of alive rays, capped by each ray's s_max
        headroom) exceeds the next phase's budget; tail passes with few
        alive rays therefore stop paying the full `budget_per_ray * C` slot
        cost (measured fill was 15-35% — the field paid 3-6x its demand).
        All decisions are traced scalars: no host round-trips, one compile.
      * **row-level batched scans** — the four [B]-length 1-D cumsums per
        pass (sample rank, optical depth, 5 composite channels, emit count)
        collapse to three [B/seg]-length scans + vectorized lane math, with
        the emit count folded into the composite-channel scan.
      * per-sample optical depth is capped at 80 (exp(-80) == 0) and
        NaN-scrubbed before the prefix scan: one overflowed f32 density
        would otherwise make the shared prefix inf/NaN and poison every
        later ray in the chunk (ADVICE r4).
    """
    import math

    assert cfg.cone_angle == 0.0, "seg eval path: uniform steps only"
    s_max = s_max or cfg.eval_s_max
    step = cfg.render_step_size
    m = cfg.max_march_steps
    ms = -(-m // seg)
    seg_len = seg * step
    dilate = _seg_dilate(cfg, seg, pool)

    @jax.jit
    def render_chunk(params, occ_state: OccGridState, origins, viewdirs,
                     timestamp, render_bkgd):
        c = origins.shape[0]
        nseg = c * ms
        b_seg = max((budget_per_ray * c) // seg, 8)
        b_seg = min(-(-b_seg // 8) * 8, -(-nseg // 8) * 8)
        multi_level = occ_state.levels > 1

        coarse = pooled_binaries(occ_state, pool=pool, dilate=dilate)
        t_min, t_max = ray_aabb_intersect(origins, viewdirs,
                                          occ_state.aabbs[-1])
        t_min = jnp.maximum(t_min, cfg.near_plane)
        t_max = jnp.minimum(t_max, cfg.far_plane)

        # ---- coarse segment probes (once per chunk) ----
        s = jnp.arange(ms, dtype=jnp.float32)
        t_lo = t_min[:, None] + s[None, :] * seg_len                 # [C, Ms]
        t_hi = jnp.maximum(jnp.minimum(t_lo + seg_len, t_max[:, None]), t_lo)
        fracs = (0.25, 0.5, 0.75) if multi_level else (0.5,)
        hit = None
        for f in fracs:
            tm = t_lo + f * (t_hi - t_lo)
            pos = origins[:, None, :] + viewdirs[:, None, :] * tm[..., None]
            h = coarse_lookup(occ_state, coarse, pos)
            hit = h if hit is None else (hit | h)
        seg_valid = (t_lo < t_max[:, None]) & hit                    # [C, Ms]

        # pack each ray's occupied segment indices ONCE (stable argsort:
        # occupied first, t-ascending) — the pass loop below then runs
        # zero lattice-sized ops: per-pass selection is a per-ray cursor
        # window, assigned to budget slots by an [C]-delta scatter + one
        # [b_seg] cumsum (the compact_select_rayfold trick at 1/Ms cost)
        order_flat = jnp.argsort(jnp.logical_not(seg_valid), axis=-1,
                                 stable=True).astype(jnp.int32).reshape(-1)
        n_segs = jnp.sum(seg_valid, axis=-1).astype(jnp.int32)       # [C]

        ray_info = jnp.concatenate(
            [origins, viewdirs, t_min[:, None], t_max[:, None]], axis=-1)
        k_off = jnp.arange(seg, dtype=jnp.int32)[None, :]            # [1, seg]

        def rem_total_of(cursor, emitted, alive):
            """Remaining demand in segments: occupied segments of alive rays,
            capped by each ray's s_max headroom (both advance monotonically,
            so this is an upper bound on the work any future pass can do)."""
            rem = jnp.maximum(n_segs - cursor, 0) * alive.astype(jnp.int32)
            segcap = jnp.maximum((s_max - emitted + seg - 1) // seg, 0)
            return jnp.sum(jnp.minimum(rem, segcap))

        def make_pass(b_seg_p: int):
            b_p = b_seg_p * seg
            slot_i = jnp.arange(b_seg_p, dtype=jnp.int32)
            tq = jnp.full((b_p, 1), jnp.reshape(timestamp, ()), jnp.float32)

            def one_pass(carry):
                cursor, trans, emitted, acc, alive = carry
                # adaptive per-ray window (the reference's N_samples =
                # max(budget/N_alive, min) policy, utils.py:235, as a traced
                # per-pass segment count — no shape change): early passes
                # give every alive ray a small t-prefix window so
                # transmittance early-termination and the s_max cap bite
                # BETWEEN passes at fine granularity; late passes (few alive
                # rays) widen automatically so the pass budget stays filled.
                rem = jnp.maximum(n_segs - cursor, 0) * alive.astype(jnp.int32)
                n_alive = jnp.maximum(jnp.sum((rem > 0).astype(jnp.int32)), 1)
                k_seg = jnp.maximum(b_seg_p // n_alive, 1)
                take = jnp.minimum(rem, k_seg)                       # [C]
                start = jnp.cumsum(take) - take
                consumed = jnp.clip(b_seg_p - start, 0, take)        # [C]
                total = jnp.minimum(jnp.sum(take), b_seg_p)
                starts_c = jnp.minimum(start, b_seg_p).astype(jnp.int32)
                end_row = jnp.minimum(start + consumed,
                                      b_seg_p).astype(jnp.int32)     # [C]

                # slot -> owning ray (zero-take rays share their start with
                # the next ray; the trailing ray at a shared start owns the
                # slots)
                ray = jnp.clip(
                    jnp.cumsum(jnp.zeros((b_seg_p,), jnp.int32)
                               .at[starts_c].add(1, mode="drop")) - 1,
                    0, c - 1)
                off = slot_i - jnp.take(starts_c, ray)
                slot_used = slot_i < total
                cur_r = jnp.take(cursor, ray)
                sidx = jnp.take(order_flat,
                                ray * ms + jnp.minimum(cur_r + off, ms - 1))

                ri = jnp.take(ray_info, ray, axis=0, indices_are_sorted=True)
                o, d = ri[:, 0:3], ri[:, 3:6]
                tmin_r, tmax_r = ri[:, 6], ri[:, 7]
                jj = sidx[:, None] * seg + k_off                     # [SB, seg]
                t0_s = tmin_r[:, None] + jj.astype(jnp.float32) * step
                t_pos = jnp.minimum(t0_s, tmax_r[:, None])  # clamp padding
                pos = (o[:, None, :]
                       + d[:, None, :] * (t_pos + 0.5 * step)[..., None])
                fine_valid = (occupancy_lookup(occ_state, pos)
                              & (t0_s < tmax_r[:, None]) & slot_used[:, None])

                # exact per-ray s_max cap: rank of each fine-valid sample
                # within its ray (flat order is ray-major / t-ascending; rows
                # are whole segments, so ray boundaries land on row
                # boundaries). The cap counts pre-alpha-prune candidates,
                # like the lattice path's `cumsum(valid) <= s_max`. Lane
                # cumsums are vectorized; only the [SB] row scan is 1-D.
                fvi = fine_valid.astype(jnp.int32)
                lane_fv = jnp.cumsum(fvi, axis=1)            # [SB, seg] incl
                row_fv = lane_fv[:, -1]                      # [SB]
                row_fv_cum = jnp.cumsum(row_fv)
                row_fv_ext = jnp.concatenate(
                    [jnp.zeros((1,), jnp.int32), row_fv_cum])
                base_rank = jnp.take(row_fv_ext, starts_c)   # [C]
                rank = ((row_fv_cum - row_fv)
                        - jnp.take(base_rank, ray))[:, None] + (lane_fv - fvi)
                em_slot = jnp.take(emitted, ray)             # [SB]
                keep_cap = fine_valid & ((em_slot[:, None] + rank) < s_max)

                # field on every slot of the selected segments (masked); the
                # ~40% fine-invalid slots trade a second compaction's cost +
                # bookkeeping for wasted forward rows (profile_eval2)
                rgb_c, res_c = field.apply(
                    params, pos.reshape(b_p, 3), tq,
                    jnp.broadcast_to(d[:, None, :],
                                     (b_seg_p, seg, 3)).reshape(b_p, 3),
                    return_internal=False)
                sig = res_c["density"].astype(jnp.float32).reshape(-1, seg)
                keep = keep_cap
                if cfg.alpha_thre > 0:
                    alpha_raw = 1.0 - jnp.exp(-sig * step)
                    keep = keep & (alpha_raw > cfg.alpha_thre)
                keep_f = keep.astype(jnp.float32)

                # per-sample optical depth, NaN-scrubbed and capped at 80
                # (exp(-80) == 0, so the cap is semantically invisible): an
                # overflowed/inf f32 density would otherwise make the shared
                # prefix scan inf and inf-inf = NaN poison every later ray
                # in the chunk (ADVICE r4); even finite extremes destroy the
                # f32 precision of later rays' prefix differences.
                sdelta = jnp.minimum(jnp.nan_to_num(sig * step),
                                     80.0) * keep_f          # [SB, seg]
                lane_sd = jnp.cumsum(sdelta, axis=1)
                row_sd = lane_sd[:, -1]                      # [SB]
                row_sd_cum = jnp.cumsum(row_sd)
                row_sd_ext = jnp.concatenate(
                    [jnp.zeros((1,), jnp.float32), row_sd_cum])
                base_sd = jnp.take(row_sd_ext, starts_c)     # [C]
                ex_sd = ((row_sd_cum - row_sd)[:, None]
                         + (lane_sd - sdelta))               # [SB, seg]
                t_slot = (jnp.take(trans, ray)[:, None]
                          * jnp.exp(-jnp.maximum(
                              ex_sd - jnp.take(base_sd, ray)[:, None], 0.0)))
                alphas = 1.0 - jnp.exp(-sdelta)
                w = t_slot * alphas                          # [SB, seg]

                # composite channels + the emit count in ONE [SB, 6] row
                # scan; per-ray sums are boundary differences at row level
                t_mid = t0_s + 0.5 * step
                rgbs = rgb_c.astype(jnp.float32).reshape(-1, seg, 3)
                chans_row = jnp.concatenate(
                    [jnp.sum(w[..., None] * rgbs, axis=1),
                     jnp.sum(w, axis=1, keepdims=True),
                     jnp.sum(w * t_mid, axis=1, keepdims=True),
                     jnp.sum(keep_cap, axis=1,
                             keepdims=True).astype(jnp.float32)],
                    axis=-1)                                 # [SB, 6]
                z = jnp.cumsum(chans_row, axis=0)
                z_ext = jnp.concatenate(
                    [jnp.zeros((1, 6), jnp.float32), z], axis=0)
                sums = (jnp.take(z_ext, end_row, axis=0)
                        - jnp.take(z_ext, starts_c, axis=0))  # [C, 6]
                acc = acc + sums[:, :5]
                emitted = emitted + sums[:, 5].astype(jnp.int32)
                od = (jnp.take(row_sd_ext, end_row)
                      - jnp.take(row_sd_ext, starts_c))
                trans = trans * jnp.exp(-od)
                cursor = cursor + consumed
                alive = alive & (trans > early_stop_eps) & (emitted < s_max)
                return cursor, trans, emitted, acc, alive

            return one_pass

        # demand-driven budget cascade: full -> /4 -> /16. Phase k keeps
        # running while remaining demand exceeds the NEXT phase's budget;
        # the final phase drains to zero. Every transition is a traced
        # comparison — one compiled program, no host syncs.
        ladder = []
        for div in (1, 4, 16):
            bs = -(-max(b_seg // div, 8) // 8) * 8
            if not ladder or bs < ladder[-1]:
                ladder.append(bs)
        carry = (jnp.zeros((c,), jnp.int32), jnp.ones((c,), jnp.float32),
                 jnp.zeros((c,), jnp.int32), jnp.zeros((c, 5), jnp.float32),
                 n_segs > 0)
        for i, bs in enumerate(ladder):
            nxt = ladder[i + 1] if i + 1 < len(ladder) else 0
            carry = jax.lax.while_loop(
                lambda cr, nxt=nxt: (
                    jnp.any(cr[4] & (cr[0] < n_segs))
                    & (rem_total_of(cr[0], cr[2], cr[4]) > nxt)),
                make_pass(bs), carry)
        _, _, _, acc, _ = carry
        opacity = acc[:, 3:4]
        depth = acc[:, 4:5] / jnp.maximum(opacity,
                                          jnp.float32(1.1920929e-07))
        rgb = acc[:, 0:3] + render_bkgd * (1.0 - opacity)
        return rgb, opacity, depth

    return render_chunk


def eval_chunk_for(cfg: SceneConfig) -> int:
    """Rays per eval chunk matching make_eval_render_fn's impl="auto" pick."""
    return (cfg.eval_chunk_seg if cfg.cone_angle == 0.0 else cfg.eval_chunk)


def make_eval_render_fn(field, cfg: SceneConfig, s_max: Optional[int] = None,
                        budgeted: bool = True, budget_per_ray: int = 64,
                        early_stop_eps: float = 1e-4, impl: str = "auto"):
    """Jitted chunk renderer for full-image evaluation.

    Returns fn(params, occ_state, origins [C,3], viewdirs [C,3], timestamp
    scalar, render_bkgd [3]) -> (rgb, opacity, depth) for a fixed chunk C.

    budgeted=True is a resumable multi-pass marcher — the TPU counterpart of
    the reference's alive-ray loop in `render_image_test(max_samples=...)`
    (cednerf/utils.py:229-308):

      * `s_max` is the per-ray max_samples contract: each ray evaluates at
        most its first s_max valid marching candidates (the viewer's samples
        slider genuinely trades speed for quality through it);
      * each pass evaluates the field on at most `budget_per_ray * C` alive
        candidates (cross-ray compaction into one fixed shape), composites
        with the transmittance carried from earlier passes
        (render_weight_from_density's prefix_trans mode,
        cednerf/render.py:42-56), and marks them processed;
      * rays whose transmittance drops below `early_stop_eps` stop consuming
        budget (the reference's early termination, utils.py:300-306);
      * a lax.while_loop repeats until no candidates remain — the field
        compiles once and overflow chunks simply take more passes, so results
        are exact up to the s_max cap and the early-stop threshold.

    budgeted=False keeps the single-pass dense [C, s_max] lattice path
    (reference shape for tests).

    impl: "auto" dispatches budgeted rendering to the segment-compacted
    fast path (make_eval_render_fn_seg) when the step schedule is uniform
    (cone_angle == 0); "seg"/"lattice" force a path. The lattice marcher
    stays as the cone-angle fallback and the A/B reference.
    """
    s_max = s_max or cfg.eval_s_max
    if impl == "auto":
        impl = "seg" if (budgeted and cfg.cone_angle == 0.0) else "lattice"
    if impl == "seg":
        if not budgeted:
            raise ValueError(
                "impl='seg' requires budgeted=True (the segment marcher is "
                "a multi-pass budgeted loop); use impl='lattice' for the "
                "single-pass dense reference path")
        return make_eval_render_fn_seg(
            field, cfg, s_max=s_max, budget_per_ray=budget_per_ray,
            early_stop_eps=early_stop_eps)

    @jax.jit
    def render_chunk(params, occ_state: OccGridState, origins, viewdirs, timestamp,
                     render_bkgd):
        n_rays = origins.shape[0]
        t = jnp.broadcast_to(jnp.reshape(timestamp, (1, 1)), (n_rays, 1))
        cand = march_candidates(
            occ_state,
            origins,
            viewdirs,
            near_plane=cfg.near_plane,
            far_plane=cfg.far_plane,
            render_step_size=cfg.render_step_size,
            cone_angle=cfg.cone_angle,
            max_march_steps=cfg.max_march_steps,
        )
        # per-ray max_samples cap: only the first s_max valid candidates count
        vcum = jnp.cumsum(cand.valid.astype(jnp.int32), axis=-1)
        valid = cand.valid & (vcum <= s_max)

        if not budgeted:
            order = jnp.argsort(jnp.logical_not(valid), axis=-1,
                                stable=True)[:, :s_max]
            take = lambda a: jnp.take_along_axis(a, order, axis=-1)
            samples = RaySamples(t_starts=take(cand.t_starts),
                                 t_ends=take(cand.t_ends),
                                 mask=take(valid))
            out = render_rays(
                field, params, origins, viewdirs, samples, t, render_bkgd,
                alpha_thre=cfg.alpha_thre, train=False,
            )
            return out.rgb, out.opacity, out.depth

        # pack each ray's first s_max valid candidates into a [C, s_max]
        # lattice ONCE (slot = vcum-1, order-preserving): every per-pass
        # op below (compaction sel build, dense scatter, transmittance
        # scan, accumulations) then runs at s_max slots instead of
        # max_march_steps — ~4x at the 800x800 eval contract, where the
        # full lattice is ~1040 wide but s_max is 64-256 (measured
        # 25-33 s/frame before, results/r3s20/eval_800).
        r = valid.shape[0]
        m = min(s_max, valid.shape[1])
        ray_idx = jax.lax.broadcasted_iota(jnp.int32, valid.shape, 0)
        dst = jnp.where(valid, ray_idx * m + (vcum - 1), r * m)

        def pack_lattice(a):
            flat = (jnp.zeros((r * m + 1,), a.dtype)
                    .at[dst.reshape(-1)]
                    .set(a.reshape(-1), mode="drop"))
            return flat[:r * m].reshape(r, m)

        p_t0 = pack_lattice(cand.t_starts)
        p_t1 = pack_lattice(cand.t_ends)
        p_dts = pack_lattice(cand.dts)
        valid = pack_lattice(valid)

        n = r * m
        budget = min(budget_per_ray * n_rays, n)
        ray_info = _ray_info(origins, viewdirs, t)
        tpack = jnp.stack(
            [p_t0.reshape(-1), p_dts.reshape(-1)], axis=-1)
        dts_lattice = p_dts

        def one_pass(carry):
            remaining, trans, rgb_acc, opac_acc, depth_acc = carry
            sel, kept = _compact_sel_kept(remaining, budget, 1,
                                          cfg.compact_impl)
            sel_valid = sel < n
            sel_c = jnp.minimum(sel, n - 1)
            ray = sel_c // m
            ri = jnp.take(ray_info, ray, axis=0, indices_are_sorted=True)
            o, d = ri[:, 0:3], ri[:, 3:6]
            tv = jnp.take(tpack, sel_c, axis=0, indices_are_sorted=True)
            t0s, dts = tv[:, 0], tv[:, 1]
            pos = o + d * (t0s + 0.5 * dts)[:, None]
            rgb_c, res_c = field.apply(params, pos, ri[:, 6:7], d,
                                       return_internal=False)
            packed = jnp.concatenate(
                [res_c["density"].astype(jnp.float32).reshape(-1, 1),
                 rgb_c.astype(jnp.float32)], axis=-1) * sel_valid[:, None]
            scat = jnp.where(sel_valid, sel,
                             n + jnp.arange(budget, dtype=jnp.int32))
            dense = (
                jnp.zeros((n, 4), jnp.float32)
                .at[scat]
                .set(packed, mode="drop", unique_indices=True,
                     indices_are_sorted=True)
            )
            sigmas = dense[:, 0].reshape(r, m)
            rgbs = dense[:, 1:4].reshape(r, m, 3)

            mask = kept
            if cfg.alpha_thre > 0:
                alpha_raw = 1.0 - jnp.exp(-sigmas * dts_lattice)
                mask = mask & (alpha_raw > cfg.alpha_thre)

            weights, _, _ = render_weights_from_density(
                p_t0, p_t1, sigmas, mask, prefix_trans=trans
            )
            rgb_acc = rgb_acc + jnp.sum(weights[..., None] * rgbs, axis=-2)
            opac_acc = opac_acc + jnp.sum(weights, axis=-1)
            t_mid = (p_t0 + p_t1) / 2.0
            depth_acc = depth_acc + jnp.sum(weights * t_mid, axis=-1)
            sdelta = sigmas * dts_lattice * mask
            new_trans = trans * jnp.exp(-jnp.sum(sdelta, axis=-1))
            remaining = (remaining & jnp.logical_not(kept)
                         & (new_trans > early_stop_eps)[:, None])
            return remaining, new_trans, rgb_acc, opac_acc, depth_acc

        init = (valid, jnp.ones((r,), jnp.float32),
                jnp.zeros((r, 3), jnp.float32), jnp.zeros((r,), jnp.float32),
                jnp.zeros((r,), jnp.float32))
        _, _, rgb_acc, opac_acc, depth_acc = jax.lax.while_loop(
            lambda c: jnp.any(c[0]), one_pass, init)
        opacity = opac_acc[:, None]
        depth = (depth_acc[:, None]
                 / jnp.maximum(opacity, jnp.float32(1.1920929e-07)))
        rgb = rgb_acc + render_bkgd * (1.0 - opacity)
        return rgb, opacity, depth

    return render_chunk


def render_image(field, params, occ_state, render_chunk_fn, origins, viewdirs,
                 timestamp, render_bkgd, chunk: int = 4096, mesh=None):
    """Host loop: render a full [H, W] image through the jitted chunk fn.

    Parity with render_image_test's output contract (rgb, opacity, depth)
    (cednerf/utils.py:313-318); the last chunk is padded to keep one compile.

    mesh: optional jax.sharding.Mesh (axis "data") — rays are embarrassingly
    parallel, so each chunk's rays are sharded across the mesh and GSPMD
    partitions the chunk program (params/occupancy replicated). The chunk
    size must be divisible by mesh.size.
    """
    import numpy as np

    ray_sharding = rep = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        assert chunk % mesh.size == 0, (chunk, mesh.size)
        ray_sharding = NamedSharding(mesh, PartitionSpec("data"))
        rep = NamedSharding(mesh, PartitionSpec())
        put_rep = lambda x: jax.device_put(x, rep)
        params = jax.tree_util.tree_map(put_rep, params)
        occ_state = jax.tree_util.tree_map(put_rep, occ_state)
        timestamp = jax.device_put(jnp.asarray(timestamp), rep)
        render_bkgd = jax.device_put(jnp.asarray(render_bkgd), rep)

    shape = origins.shape[:-1]
    o = np.asarray(origins, np.float32).reshape(-1, 3)
    d = np.asarray(viewdirs, np.float32).reshape(-1, 3)
    n = o.shape[0]
    # never pad a small frame up to a full chunk (a 256-ray test image
    # must not compile/run a 32768-ray program); keep 8-row alignment and
    # mesh divisibility
    q = 8 if mesh is None else max(8, int(np.lcm(8, mesh.size)))
    chunk = min(chunk, -(-n // q) * q)
    # Dispatch every chunk before fetching any result: jitted calls queue
    # asynchronously on the device, so the ~30 ms host round-trip through a
    # tunneled chip is paid once per image instead of once per chunk.
    pending = []
    for i in range(0, n, chunk):
        co, cd = o[i:i + chunk], d[i:i + chunk]
        pad = chunk - co.shape[0]
        if pad:
            co = np.pad(co, ((0, pad), (0, 0)))
            cd = np.pad(cd, ((0, pad), (0, 0)), constant_values=1.0)
        co, cd = jnp.asarray(co), jnp.asarray(cd)
        if ray_sharding is not None:
            co = jax.device_put(co, ray_sharding)
            cd = jax.device_put(cd, ray_sharding)
        out = render_chunk_fn(params, occ_state, co, cd, timestamp,
                              render_bkgd)
        pending.append((out, chunk - pad))
    rgbs, opacs, depths = [], [], []
    for (rgb, opac, depth), keep in pending:
        rgbs.append(np.asarray(rgb)[:keep])
        opacs.append(np.asarray(opac)[:keep])
        depths.append(np.asarray(depth)[:keep])
    rgb = np.concatenate(rgbs).reshape(*shape, 3)
    opac = np.concatenate(opacs).reshape(*shape, 1)
    depth = np.concatenate(depths).reshape(*shape, 1)
    return rgb, opac, depth
