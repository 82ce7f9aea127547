"""Multi-level occupancy grid + masked fixed-shape ray marching.

TPU-native replacement for nerfacc's CUDA `OccGridEstimator` and its
traversal/marching kernels (reference call sites: train_real.py:185-187,
:332-336; cednerf/utils.py:115-125, :215-264 — see SURVEY §2b N1/N3).

Semantics preserved from nerfacc:
  * nested AABB levels — level i is the ROI AABB scaled by 2^i about its
    center;
  * EMA occupancy updates: sampled cells are probed at a jittered position,
    occs[cell] <- max(occs[cell] * ema_decay, new_occ), binarized against
    min(mean(occs), occ_thre); during warmup all cells are probed, afterwards
    a uniformly sampled quarter;
  * marching: uniform steps of `render_step_size` with cone-angle step growth
    (dt = clamp(t * cone_angle, step, inf)), stratified start jitter during
    training, samples kept only where the *finest containing level's* cell is
    occupied.

TPU-first redesign: instead of ragged packed samples from an irregular CUDA
traversal, `march_rays` evaluates a *fixed* number of candidate steps per ray,
masks them by occupancy, and compacts the valid ones to the front of a padded
[n_rays, s_max] buffer. Everything is jittable and differentiable-free
(marching produces constants w.r.t. parameters), so the whole train step —
occupancy update included — compiles into one XLA program.
"""

from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class OccGridState(NamedTuple):
    """Occupancy grid state (a pytree; replicated across the device mesh).

    occs:     [levels, res^3]  EMA density*step values; -1 marks invisible cells.
    binaries: [levels, res, res, res]  occupancy bits used by marching.
    aabbs:    [levels, 6]  per-level AABBs (min_xyz, max_xyz).
    """

    occs: jnp.ndarray
    binaries: jnp.ndarray
    aabbs: jnp.ndarray

    @property
    def resolution(self) -> int:
        return self.binaries.shape[-1]

    @property
    def levels(self) -> int:
        return self.binaries.shape[0]


def create_occ_grid(roi_aabb, resolution: int = 128, levels: int = 1) -> OccGridState:
    """Build an all-unoccupied grid with nested 2x AABB levels (nerfacc N1)."""
    roi = np.asarray(roi_aabb, np.float32)
    center = (roi[:3] + roi[3:]) / 2.0
    half = (roi[3:] - roi[:3]) / 2.0
    aabbs = np.stack(
        [np.concatenate([center - half * 2.0 ** l, center + half * 2.0 ** l]) for l in range(levels)]
    )
    return OccGridState(
        occs=jnp.zeros((levels, resolution ** 3), jnp.float32),
        binaries=jnp.zeros((levels, resolution, resolution, resolution), bool),
        aabbs=jnp.asarray(aabbs),
    )


def _cell_coords(flat_idx, res: int):
    """flat -> (ix, iy, iz) with x slowest: flat = (ix*res + iy)*res + iz."""
    iz = flat_idx % res
    iy = (flat_idx // res) % res
    ix = flat_idx // (res * res)
    return jnp.stack([ix, iy, iz], axis=-1)


def _flat_index(coords, res: int):
    return (coords[..., 0] * res + coords[..., 1]) * res + coords[..., 2]


def update_occ_grid(
    state: OccGridState,
    density_fn,
    key,
    *,
    occ_thre: float = 1e-2,
    ema_decay: float = 0.95,
    sample_fraction: float = 0.25,
    all_cells: bool = False,
    chunk: int = 2 ** 16,
) -> OccGridState:
    """One EMA occupancy update (nerfacc `update_every_n_steps` internals).

    density_fn: (x [M, 3] world positions, key) -> [M, 1] density *
    render_step_size (the occ_eval_fn contract of train_real.py:324-328; the
    per-chunk key lets the caller randomize the probe time per cell, matching
    the reference's random-t density probe). `all_cells=True` is the warmup
    mode (step < 256).
    """
    levels, n_cells = state.occs.shape
    res = state.resolution
    aabb_min = state.aabbs[:, :3]
    aabb_size = state.aabbs[:, 3:] - state.aabbs[:, :3]

    if all_cells:
        cells = jnp.broadcast_to(jnp.arange(n_cells, dtype=jnp.int32)[None], (levels, n_cells))
    else:
        n_sample = int(n_cells * sample_fraction)
        key, sub = jax.random.split(key)
        cells = jax.random.randint(sub, (levels, n_sample), 0, n_cells, jnp.int32)

    key, sub = jax.random.split(key)
    jitter = jax.random.uniform(sub, (*cells.shape, 3))
    coords = _cell_coords(cells, res).astype(jnp.float32)  # [levels, M, 3]
    x = aabb_min[:, None, :] + (coords + jitter) / res * aabb_size[:, None, :]

    # Probe densities in bounded chunks so warmup (levels * res^3 queries)
    # doesn't materialize a giant intermediate.
    flat_x = x.reshape(-1, 3)
    m = flat_x.shape[0]
    pad = (-m) % chunk
    flat_x = jnp.pad(flat_x, ((0, pad), (0, 0)))
    n_chunks = flat_x.shape[0] // chunk
    key, sub = jax.random.split(key)
    chunk_keys = jax.random.split(sub, n_chunks)
    occ = jax.lax.map(
        lambda args: density_fn(args[0], args[1]),
        (flat_x.reshape(n_chunks, chunk, 3), chunk_keys),
    )
    occ = occ.reshape(-1)[:m].reshape(cells.shape)

    # Duplicate-safe EMA max-update: scatter-max the candidates, then combine
    # with the decayed old values only where a cell was actually sampled.
    cand = jnp.full_like(state.occs, -jnp.inf)
    lvl_ids = jnp.broadcast_to(jnp.arange(levels, dtype=jnp.int32)[:, None], cells.shape)
    cand = cand.at[lvl_ids.reshape(-1), cells.reshape(-1)].max(occ.reshape(-1))
    sampled = cand > -jnp.inf
    occs = jnp.where(
        sampled & (state.occs >= 0.0),
        jnp.maximum(state.occs * ema_decay, jnp.maximum(cand, 0.0)),
        state.occs,
    )

    visible = occs >= 0.0
    mean_occ = jnp.sum(jnp.where(visible, occs, 0.0)) / jnp.maximum(jnp.sum(visible), 1)
    thre = jnp.minimum(mean_occ, occ_thre)
    binaries = (occs > thre).reshape(state.binaries.shape)
    return OccGridState(occs=occs, binaries=binaries, aabbs=state.aabbs)


def mark_invisible_cells(state: OccGridState, K, c2w, width: int, height: int,
                         near_plane: float = 0.0) -> OccGridState:
    """Mark cells outside every training camera frustum as invisible (occ = -1).

    Port of nerfacc `mark_invisible_cells` semantics (used by the reference
    for DyNeRF GUI runs, train_real.py:205-211): a cell is visible if its
    center projects inside at least one camera image beyond the near plane.

    Args: K [3,3] (or [n_cams,3,3]) intrinsics, c2w [n_cams, 3or4, 4].
    """
    res = state.resolution
    levels = state.levels
    K = jnp.asarray(K, jnp.float32)
    if K.ndim == 2:
        K = K[None]
    c2w = jnp.asarray(c2w, jnp.float32)[:, :3, :]  # [C, 3, 4]
    rot_t = jnp.swapaxes(c2w[:, :, :3], 1, 2)  # world->cam rotation [C, 3, 3]
    cam_pos = c2w[:, :, 3]  # [C, 3]

    cells = jnp.arange(res ** 3, dtype=jnp.int32)
    coords = _cell_coords(cells, res).astype(jnp.float32) + 0.5  # cell centers

    def level_visibility(aabb):
        amin, asize = aabb[:3], aabb[3:] - aabb[:3]
        pts = amin + coords / res * asize  # [M, 3]

        def one_cam(args):
            rt, pos, k = args
            local = (pts - pos) @ rt.T  # [M, 3] cam coords
            z = local[:, 2]
            uvw = local @ k.T
            u = uvw[:, 0] / jnp.where(z == 0, 1.0, z)
            v = uvw[:, 1] / jnp.where(z == 0, 1.0, z)
            return (z > near_plane) & (u >= 0) & (u < width) & (v >= 0) & (v < height)

        vis = jax.lax.map(one_cam, (rot_t, cam_pos, jnp.broadcast_to(K, (c2w.shape[0], 3, 3))))
        return jnp.any(vis, axis=0)

    visible = jax.vmap(level_visibility)(state.aabbs)  # [levels, M]
    occs = jnp.where(visible, state.occs, -1.0)
    return state._replace(occs=occs)


def ray_aabb_intersect(origins, viewdirs, aabb) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Slab-test ray/AABB intersection (nerfacc N3 equivalent).

    Returns (t_min, t_max); t_min > t_max means a miss.
    """
    inv_d = 1.0 / jnp.where(jnp.abs(viewdirs) < 1e-10, 1e-10, viewdirs)
    t0 = (aabb[:3] - origins) * inv_d
    t1 = (aabb[3:] - origins) * inv_d
    t_min = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_max = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return jnp.maximum(t_min, 0.0), t_max


class RaySamples(NamedTuple):
    """Padded per-ray sample intervals: all arrays are [n_rays, s_max]."""

    t_starts: jnp.ndarray
    t_ends: jnp.ndarray
    mask: jnp.ndarray  # bool validity

    @property
    def num_valid(self):
        return jnp.sum(self.mask)


def occupancy_lookup(state: OccGridState, pos):
    """Occupancy of positions using the finest grid level containing them.

    pos: [..., 3] -> bool [...]. Mirrors nerfacc's multi-grid traversal where
    a sample is tested against the smallest (finest) enclosing level.
    """
    res = state.resolution
    amin = state.aabbs[:, :3]
    amax = state.aabbs[:, 3:]
    inside = jnp.all(
        (pos[..., None, :] >= amin) & (pos[..., None, :] <= amax), axis=-1
    )  # [..., levels]
    any_inside = jnp.any(inside, axis=-1)
    level = jnp.argmax(inside, axis=-1)  # first (finest) containing level

    lmin = amin[level]
    lsize = amax[level] - amin[level]
    u = (pos - lmin) / lsize
    ic = jnp.clip(jnp.floor(u * res).astype(jnp.int32), 0, res - 1)
    # Gather whole z-rows ([*, res] bool) and select the z bit with a lane
    # compare: one [M, res]-row gather + fused elementwise, which measured
    # 2.2x faster than M scalar-element gathers on v5e (scalar takes pay
    # full per-row overhead for 1 byte of payload).
    lead = ic.shape[:-1]
    zrow_idx = ((level.reshape(-1) * res + ic[..., 0].reshape(-1)) * res
                + ic[..., 1].reshape(-1))
    rows = jnp.take(state.binaries.reshape(-1, res), zrow_idx, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, res), 1)
    hit = jnp.any(rows & (lane == ic[..., 2].reshape(-1, 1)), axis=-1)
    return hit.reshape(lead) & any_inside


def pooled_binaries(state: OccGridState, pool: int = 4,
                    dilate: int = 1) -> jnp.ndarray:
    """Conservative coarse occupancy for segment-level marching.

    Returns [levels, res/pool, res/pool, res/pool] bool where a coarse cell
    is set iff ANY fine cell within its `pool`^3 block — or within `dilate`
    coarse cells around it — is occupied at this level OR any finer one.
    Finer levels are OR'd in (each level's AABB is the center half of the
    next, so level l-1 2x-pooled lands in the central res/2 block of level
    l): marching tests only the finest level CONTAINING a segment midpoint,
    but a sample inside that segment can fall in a finer nested level whose
    own bits level l's probes don't imply.

    The dilation makes a single midpoint test cover a whole segment: with
    segment length <= dilate * coarse cell size (+ a fine cell diagonal),
    every sample position of a coarse-occupied segment maps into the dilated
    neighborhood. This is the TPU replacement for nerfacc's per-level DDA
    traversal (SURVEY N3).

    Superset scope (ADVICE r4): for SINGLE-level grids a probe never drops a
    valid sample. With nested levels the guarantee is per-probed-level only:
    finer levels are OR'd into coarser ones, but the dilation window clips at
    each level's AABB (reduce_window SAME pads False), so occupancy that
    exists only in the COARSER level just outside a finer level's boundary is
    not visible to a probe that lands inside the finer level. Consumers must
    probe multiple points per segment on multi-level grids so at least one
    probe lands in each level the segment crosses (the seg eval renderer
    probes 3 fracs; equality-tested against the dense path in
    tests/test_eval_renderer.py).
    """
    L, res = state.binaries.shape[0], state.resolution
    assert res % pool == 0 and res % 4 == 0
    combined = []
    prev = None  # previous (finer) level's combined bits at full res
    for l in range(L):
        bits = state.binaries[l]
        if prev is not None:
            # 2x maxpool the finer level, embed at the center of this one
            p2 = jax.lax.reduce_window(
                prev, False, jax.lax.bitwise_or,
                (2, 2, 2), (2, 2, 2), "VALID")
            q = res // 4
            bits = bits | jnp.pad(
                p2, ((q, q), (q, q), (q, q)), constant_values=False)
        combined.append(bits)
        prev = bits
    comb = jnp.stack(combined)  # [L, res, res, res]
    coarse = jax.lax.reduce_window(
        comb, False, jax.lax.bitwise_or,
        (1, pool, pool, pool), (1, pool, pool, pool), "VALID")
    if dilate:
        k = 2 * dilate + 1
        coarse = jax.lax.reduce_window(
            coarse, False, jax.lax.bitwise_or,
            (1, k, k, k), (1, 1, 1, 1), "SAME")
    return coarse


def coarse_lookup(state: OccGridState, coarse: jnp.ndarray, pos):
    """occupancy_lookup against a pooled_binaries grid. pos [..., 3] -> bool."""
    res_c = coarse.shape[-1]
    amin = state.aabbs[:, :3]
    amax = state.aabbs[:, 3:]
    inside = jnp.all(
        (pos[..., None, :] >= amin) & (pos[..., None, :] <= amax), axis=-1
    )
    any_inside = jnp.any(inside, axis=-1)
    level = jnp.argmax(inside, axis=-1)
    lmin = amin[level]
    lsize = amax[level] - amin[level]
    u = (pos - lmin) / lsize
    ic = jnp.clip(jnp.floor(u * res_c).astype(jnp.int32), 0, res_c - 1)
    lead = ic.shape[:-1]
    zrow_idx = ((level.reshape(-1) * res_c + ic[..., 0].reshape(-1)) * res_c
                + ic[..., 1].reshape(-1))
    rows = jnp.take(coarse.reshape(-1, res_c), zrow_idx, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, res_c), 1)
    hit = jnp.any(rows & (lane == ic[..., 2].reshape(-1, 1)), axis=-1)
    return hit.reshape(lead) & any_inside


class RayCandidates(NamedTuple):
    """Dense (uncompacted) marching candidates: all arrays [n_rays, n_steps].

    The train path consumes these directly (cross-ray budgeted compaction in
    engine/renderer.py); `march_rays` compacts them per ray for eval.
    """

    t_starts: jnp.ndarray
    dts: jnp.ndarray
    valid: jnp.ndarray  # bool
    # [n_rays] bool, True when the lattice covered the ray's whole
    # possibly-occupied span — False means far samples were truncated and
    # the ray must be loss-masked (None = assume covered, legacy callers)
    covered: Optional[jnp.ndarray] = None

    @property
    def t_ends(self):
        return self.t_starts + self.dts


def march_t_lattice(
    state: OccGridState,
    origins,
    viewdirs,
    *,
    near_plane: float,
    far_plane: float,
    render_step_size: float,
    cone_angle: float = 0.0,
    max_march_steps: int = 1024,
    stratified_key=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The candidate t lattice (no occupancy): (t0 [R, M], dt [R, M],
    t_max [R]). Uniform steps with cone-angle growth + stratified jitter —
    nerfacc's step schedule (SURVEY N1)."""
    n_rays = origins.shape[0]
    # Enter at the outermost level's AABB.
    t_min, t_max = ray_aabb_intersect(origins, viewdirs, state.aabbs[-1])
    t_min = jnp.maximum(t_min, near_plane)
    t_max = jnp.minimum(t_max, far_plane)

    if stratified_key is not None:
        t_min = t_min + jax.random.uniform(stratified_key, (n_rays,)) * render_step_size

    if cone_angle == 0.0:
        steps = jnp.arange(max_march_steps, dtype=jnp.float32)
        t0 = t_min[:, None] + steps[None, :] * render_step_size
        dt = jnp.full_like(t0, render_step_size)
    else:
        def scan_step(t, _):
            d = jnp.clip(t * cone_angle, min=render_step_size)
            return t + d, (t, d)

        _, (t0_t, dt_t) = jax.lax.scan(scan_step, t_min, None, length=max_march_steps)
        t0 = jnp.swapaxes(t0_t, 0, 1)
        dt = jnp.swapaxes(dt_t, 0, 1)
    return t0, dt, t_max


# advance_t_min's probe geometry — named so callers that must bound the
# probe's conservative earliness (engine/train.py _steady_margin) derive
# their margins from the same constants instead of re-hardcoding them
SKIP_SEG_DEFAULT = 8
SKIP_POOL_DEFAULT = 4
SKIP_DILATE = 1


def advance_t_min(
    state: OccGridState,
    origins,
    viewdirs,
    t_min,
    t_max,
    *,
    render_step_size: float,
    march_steps: int,
    probe_steps: int,
    skip_seg: int = SKIP_SEG_DEFAULT,
    pool: int = SKIP_POOL_DEFAULT,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Advance each ray's lattice start past leading empty space.

    Probes a coarse [R, probe_steps/skip_seg] segment lattice spanning the
    full AABB traversal against `pooled_binaries` (a conservative superset
    — a False probe proves every fine sample in the segment is unoccupied),
    then returns:

      t_min_adv [R]: t_min advanced by whole skip_seg*step quanta to the
        first possibly-occupied segment — so a `march_steps`-slot lattice
        built from it lands on EXACTLY the original lattice's sample
        positions, minus leading slots that were invalid anyway;
      covered [R] bool: True when every possibly-occupied segment fits
        within march_steps slots of the advanced start. Rays with longer
        occupied spans must be loss-masked by the caller (same contract as
        budget overflow) — they render from a truncated lattice.

    Uniform steps only (cone growth changes dt with absolute t, so a far
    segment's span can exceed the pooled grid's dilated reach and the
    superset argument breaks — same gate as march_segments).
    """
    step = render_step_size
    ms = -(-probe_steps // skip_seg)
    seg_len = skip_seg * step
    coarse = pooled_binaries(state, pool=pool, dilate=SKIP_DILATE)
    s = jnp.arange(ms, dtype=jnp.float32)
    t_lo = t_min[:, None] + s[None, :] * seg_len                  # [R, Ms]
    t_hi = jnp.maximum(jnp.minimum(t_lo + seg_len, t_max[:, None]), t_lo)
    tm = 0.5 * (t_lo + t_hi)
    pos = origins[:, None, :] + viewdirs[:, None, :] * tm[..., None]
    occ_seg = (t_lo < t_max[:, None]) & coarse_lookup(state, coarse, pos)
    any_occ = jnp.any(occ_seg, axis=-1)
    first = jnp.argmax(occ_seg, axis=-1).astype(jnp.int32)
    last = (ms - 1) - jnp.argmax(occ_seg[:, ::-1], axis=-1).astype(jnp.int32)
    t_min_adv = jnp.where(
        any_occ, t_min + first.astype(jnp.float32) * seg_len, t_max)
    covered = jnp.logical_or(
        jnp.logical_not(any_occ),
        (last + 1 - first) * skip_seg <= march_steps)
    return t_min_adv, covered


def march_candidates(
    state: OccGridState,
    origins,
    viewdirs,
    *,
    near_plane: float,
    far_plane: float,
    render_step_size: float,
    cone_angle: float = 0.0,
    max_march_steps: int = 1024,
    stratified_key=None,
    probe_steps: int = 0,
    skip_seg: int = 8,
) -> RayCandidates:
    """Evaluate all marching candidates: uniform steps with cone-angle growth,
    masked by occupancy of the finest containing grid level.

    Replaces nerfacc's `estimator.sampling` traversal (cednerf/utils.py:115-125)
    with a fixed-shape [n_rays, max_march_steps] candidate lattice; no
    compaction happens here (that's a consumer decision — per-ray for eval,
    cross-ray budgeted for training).

    probe_steps > 0 (uniform steps only) enables empty-space skipping: the
    per-ray lattice start advances past leading unoccupied space (tested on
    the pooled coarse grid over a probe_steps-slot span, see advance_t_min),
    so `max_march_steps` can be much smaller than the full-traversal slot
    count. Sample positions are identical to the full lattice's — the
    advance is a whole number of steps — and `covered` flags the rays whose
    occupied span still exceeded the shrunken lattice (callers loss-mask
    them, like budget overflow). Every steady-state lattice-proportional
    cost (occupancy gathers, compaction cumsum/scatter, position math)
    shrinks by probe_steps/max_march_steps.
    """
    covered = None
    if probe_steps > max_march_steps and cone_angle == 0.0:
        t_min0, t_max = ray_aabb_intersect(origins, viewdirs, state.aabbs[-1])
        t_min0 = jnp.maximum(t_min0, near_plane)
        t_max = jnp.minimum(t_max, far_plane)
        if stratified_key is not None:
            t_min0 = t_min0 + jax.random.uniform(
                stratified_key, (origins.shape[0],)) * render_step_size
        t_min, covered = advance_t_min(
            state, origins, viewdirs, t_min0, t_max,
            render_step_size=render_step_size,
            march_steps=max_march_steps, probe_steps=probe_steps,
            skip_seg=skip_seg,
        )
        steps = jnp.arange(max_march_steps, dtype=jnp.float32)
        t0 = t_min[:, None] + steps[None, :] * render_step_size
        dt = jnp.full_like(t0, render_step_size)
    else:
        t0, dt, t_max = march_t_lattice(
            state, origins, viewdirs, near_plane=near_plane,
            far_plane=far_plane, render_step_size=render_step_size,
            cone_angle=cone_angle, max_march_steps=max_march_steps,
            stratified_key=stratified_key,
        )
    t_mid = t0 + dt / 2.0
    pos = origins[:, None, :] + viewdirs[:, None, :] * t_mid[..., None]
    valid = (t0 < t_max[:, None]) & occupancy_lookup(state, pos)
    return RayCandidates(t_starts=t0, dts=dt, valid=valid, covered=covered)


def march_rays(
    state: OccGridState,
    origins,
    viewdirs,
    *,
    near_plane: float,
    far_plane: float,
    render_step_size: float,
    cone_angle: float = 0.0,
    max_march_steps: int = 1024,
    s_max: int = 256,
    stratified_key=None,
) -> RaySamples:
    """March rays into a per-ray compacted padded sample buffer.

    `march_candidates` + stable per-ray compaction of the valid samples into
    the first `s_max` slots (fixed-shape [n_rays, s_max] replacement for
    nerfacc's ragged packed output). Used by the eval renderer; the train path
    uses the candidates directly with cross-ray budgeted compaction.
    """
    cand = march_candidates(
        state, origins, viewdirs, near_plane=near_plane, far_plane=far_plane,
        render_step_size=render_step_size, cone_angle=cone_angle,
        max_march_steps=max_march_steps, stratified_key=stratified_key,
    )
    # Stable per-ray compaction: valid samples first, order preserved.
    order = jnp.argsort(jnp.logical_not(cand.valid), axis=-1, stable=True)[:, :s_max]
    take = lambda a: jnp.take_along_axis(a, order, axis=-1)
    return RaySamples(t_starts=take(cand.t_starts), t_ends=take(cand.t_ends),
                      mask=take(cand.valid))
