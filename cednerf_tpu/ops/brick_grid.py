"""Brick-layout multiresolution hash grid — the TPU-first hot-path encoder.

Why this exists: the straightforward NGP table layout ([rows, F=2], one gather
per corner) makes XLA issue 8 tiny (8-byte-row) gathers per sample-level —
per-row overhead-bound and ~20x slower than necessary. This module
restructures the *storage layout* so one gathered row carries a full
interpolation neighborhood, and shapes everything around measured v5e rates
(XLA row gather: ~5 ms fixed per op + ~0.5 ms marginal per 262k rows when
ops share a program; scatter-add: ~2.7 ms per 262k 512-B rows, insensitive
to table size and index collisions — both per-row overhead-bound rather
than bandwidth-bound):

  * each table row holds a 4x4x4 "brick" of corner features
    (64 corners x F feats; F=2 -> 128 floats = 512 B = one lane-aligned row);
  * a brick covers 3x3x3 cells, so every cell's 8 interpolation corners live
    in a single row -> ONE row gather per (sample, level) instead of eight;
  * trilinear interpolation is an elementwise weight multiply + one skinny
    [N, 64F] @ [64F, F] MXU matmul (batched-matvec einsums lower poorly);
  * every level's table is capped at `max_table_rows` (default 16384 rows =
    8 MB fp32) — uncapped tables ballooned XLA compile time into minutes and
    parameter memory into GBs for zero gather-rate benefit;
  * the backward runs through an analytic custom VJP (`_make_level_encode`):
    one scatter-add of weighted cotangent rows for the table gradient plus a
    per-axis derivative-weight contraction for the input-position gradient
    (needed by the motion warp). Autodiff through the weight outer product
    materialized [N,4,4,4,F] intermediates and took minutes to compile.

Semantics vs the reference NGP hash grid (hash_encoder_half.py:37-229):
  * DENSE levels (brick count <= max_table_rows): exact. The parameters are
    the canonical corner grid [X, Y, Z, F]; bricks are materialized per step
    by three axis-wise reshape/concat expansions + one transpose (pure
    bandwidth, fully differentiable), so shared corners stay shared.
  * HASHED levels: hashing happens at brick granularity (xor-prime hash of
    the brick coordinate, primes per hash_encoder_half.py:71) instead of per
    corner. Collision structure differs from NGP's per-corner hashing —
    features are C0-discontinuous across brick boundaries at these (fine)
    levels, where cells are sub-pixel. At the capped 16384 rows a level holds
    2^20 corner slots (the reference's log2_hashmap_size=21 default holds
    2^21 hashed corners per level).

Resolution schedule matches the reference (base * exp(l * log_b)).
"""

import dataclasses
import functools
import math
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .hash_grid import _PRIMES, level_resolution, level_scale

BRICK_CELLS = 3          # cells per brick edge
BRICK_CORNERS = 4        # corners per brick edge
CORNERS_PER_BRICK = 64   # 4^3


@dataclasses.dataclass(frozen=True)
class BrickGridSpec:
    """Static config for the brick-layout grid (3D, or 4D with keyframes).

    `max_table_rows` caps every level's table (dense or hashed) so it stays
    VMEM-resident on TPU (16384 rows x 512 B = 8 MB <= ~16 MB VMEM/core).
    Measured on a v5e: row gathers/scatters are per-row overhead-bound
    (~50-100 M rows/s) regardless of table size, but capped tables bound the
    parameter memory, keep XLA compile time sane (giant dense materializations
    were the pathology), and leave headroom for wider rows (larger
    n_features) which carry more payload per gather.
    """

    n_levels: int = 16
    n_features: int = 2
    base_res: int = 16
    max_res: int = 4096
    log2_hashmap_size: int = 19
    time_keyframes: int = 0
    max_table_rows: int = 16384
    # optional LARGER row cap for the finest levels (>= fine_from_level):
    # collision_stats.py shows fine hashed levels collide at 0.92-0.96 at
    # the 16384-row cap vs 0.42-0.49 for the reference's per-corner 2^21;
    # bigger fine tables trade HBM (cheap) for aliasing. Levels above the
    # VMEM bound simply fall back to the XLA scatter per level (measured
    # insensitive to table size). 0 = disabled (uniform cap).
    fine_table_rows: int = 0
    fine_from_level: int = 5
    # table-gradient scatter accumulator dtype: "bfloat16" keeps the [N, 64F]
    # update rows in bf16 end-to-end (no convert copies, half the scatter
    # read traffic; the reference's tcnn accumulates hash grads in fp16 too,
    # hash_encoder_half.py); "float32" is exact (used by grad-parity tests)
    grad_accum_dtype: str = "float32"
    # table-gradient scatter implementation: "xla" (.at[].add), "pallas"
    # (VMEM-resident accumulator, ops/pallas_scatter.py), "onehot" (MXU
    # one-hot matmul, tiny tables only), "fused" (whole level backward —
    # lane math + VMEM accumulator — as one Pallas kernel,
    # ops/pallas_encoder.py interp_bwd_fused; 3D levels only), or "auto"
    # (onehot for tables <= 1024 rows, pallas otherwise). Non-xla impls
    # fall back when their shape preconditions fail (see _scatter_rows).
    scatter_impl: str = "xla"
    # interpolation implementation: "xla" (per-level lane math fused by the
    # XLA compiler), "pallas" (all levels' forward lane math in ONE
    # Pallas kernel, ops/pallas_encoder.py interp_fwd, with the per-level
    # fused backward kernels for the table grads), or "dma" (round-3: the
    # forward's row gathers AND interp run inside one kernel with
    # depth-pipelined per-row DMAs, ops/pallas_fused.py — gathered rows
    # never touch HBM; brick row_layout only). 3D specs only; all fall
    # back to "xla" when shape preconditions fail
    interp_impl: str = "xla"
    # Recompute the gathered brick rows in the backward instead of saving
    # them as VJP residuals. The residuals cost N * 64F * 2 B * n_levels of
    # HBM (≈ 4 GB per 1M samples at L8F4) — binding at the 2-4M-sample
    # budgets of the throughput ladder — while the re-gather is one extra
    # row gather per level (~0.5 ms marginal each on v5e; two for the 4D
    # keyframe path, whose saved lo/hi rows are 2x the 3D footprint).
    remat_feats: bool = False
    # Hot-row layout for HASHED 3D levels: "brick" gathers the whole
    # 64-corner brick row per sample; "cell" re-materializes the table per
    # step as one row per (brick, cell) with just that cell's 8 corners
    # ([rows*27, 8F], one MXU expansion matmul), so every per-sample
    # gather/scatter/lane-math op runs at 8F lanes instead of 64F (same
    # math — the other 56 lanes carry zero weight). "cellz" packs each
    # brick's z-column of 3 cells into one 24F-lane row ([rows*9, 24F]) —
    # same math again, but per-sample rows are 96 lanes at F=4, the
    # measured-efficient v5e gather width (W=32 takes run at ~half the
    # rows/s). Dense levels and the 4D keyframe path keep the brick/cell
    # layouts.
    row_layout: str = "brick"
    # Per-level cell-layout guard: a level whose cell table would exceed
    # this many rows keeps the BRICK layout instead. Measured
    # (tools/profile_scatter_rows.py, v5e, 1M bf16 update rows, W=32):
    # scatter-add marginal cost is ~6-10 ns/row up to 442k-row tables but
    # degenerates to ~98 ns/row at 1M and ~121 at 4M — so e.g.
    # fine_table_rows=65536 (1.77M cell rows) must NOT run cell-layout
    # scatters, while its 65536-row W=256 brick scatter stays ~11 ns/row.
    cell_rows_cap: int = 524288

    @property
    def log_b(self) -> float:
        if self.n_levels == 1:
            return 0.0
        return math.log(self.max_res / self.base_res) / (self.n_levels - 1)

    @property
    def output_dim(self) -> int:
        return self.n_levels * self.n_features

    @property
    def row_width(self) -> int:
        """Floats per brick row (per keyframe slice)."""
        return CORNERS_PER_BRICK * self.n_features

    @property
    def keyframes(self) -> int:
        return max(self.time_keyframes, 1)

    def level_layout(self) -> List[dict]:
        """Per-level static layout descriptors."""
        base_rows = max(2 ** self.log2_hashmap_size // 16, 1)
        out = []
        for lvl in range(self.n_levels):
            if self.fine_table_rows and lvl >= self.fine_from_level:
                hashed_rows = self.fine_table_rows
            else:
                hashed_rows = min(base_rows, self.max_table_rows)
            res = level_resolution(level_scale(lvl, self.log_b, self.base_res))
            # corner lattice spans [0, res]; bricks of 3 cells cover it
            n_bricks_axis = max((res + BRICK_CELLS - 1) // BRICK_CELLS, 1)
            dense_rows = n_bricks_axis ** 3
            hashed = dense_rows > hashed_rows
            out.append({
                "res": res,
                "n_bricks_axis": n_bricks_axis,
                "rows": hashed_rows if hashed else dense_rows,
                "hashed": hashed,
            })
        return out

    def param_shapes(self) -> List[Tuple[str, Tuple[int, ...]]]:
        """Parameter tensors per level: dense corner grids or brick tables."""
        shapes = []
        k = self.keyframes
        for lvl, lay in enumerate(self.level_layout()):
            if lay["hashed"]:
                shapes.append(
                    (f"bricks_{lvl}", (lay["rows"], k * self.row_width))
                )
            else:
                n = lay["n_bricks_axis"] * BRICK_CELLS + 1  # canonical corners
                shapes.append((f"grid_{lvl}", (n, n, n, k * self.n_features)))
        return shapes

    def init_params(self, key):
        params = {}
        for (name, shape), k in zip(
            self.param_shapes(), jax.random.split(key, self.n_levels)
        ):
            params[name] = jax.random.uniform(k, shape, jnp.float32, -1e-4, 1e-4)
        return params


def _scatter_rows(rows, upd, n_rows: int, adt, impl: str):
    """Dispatch a table-gradient scatter-add to the configured impl.

    Returns [n_rows, upd.shape[-1]] in accumulator dtype `adt`. Falls back
    to XLA's .at[].add whenever an impl's shape preconditions fail (sample
    count not tile-divisible, accumulator too large for VMEM, table too big
    for the one-hot matmul), so every spec stays runnable on every batch.
    """
    n, w = upd.shape
    if impl == "xla" and n_rows <= 512 and n >= 65536:
        # Tiny dense tables (e.g. the coarsest level's 216 bricks): the
        # .at[].add scatter still pays the v5e per-row wall (~10.7 ms per
        # 1M rows, trace 2026-08-19) — a one-hot MXU contraction does the
        # same accumulation in FLOPs (n*n_rows*w*2 ≈ 110 GFLOP at 1M x 216
        # x 256 ≈ 1-2 ms) with f32 accumulation (more accurate than the
        # bf16 sequential scatter it replaces).
        oh = (rows[:, None] == jnp.arange(n_rows, dtype=rows.dtype)[None, :])
        return jax.lax.dot_general(
            oh.astype(upd.dtype), upd,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(adt)
    if impl == "auto":
        impl = "onehot" if n_rows <= 1024 else "pallas"
    if impl == "fused":
        # "fused" is handled upstream (interp_bwd_fused) when its
        # preconditions hold; here it means that path fell through, so use
        # the VMEM-accumulator scatter as the closest standalone impl.
        impl = "pallas"
    if impl == "onehot" and n_rows <= 1024 and n % 2048 == 0:
        from .pallas_scatter import scatter_add_onehot
        return scatter_add_onehot(rows, upd, n_rows=n_rows, accum_dtype=adt,
                                  block=2048)
    if (impl == "pallas" and n % 2048 == 0
            and n_rows * w * jnp.dtype(adt).itemsize <= 12 * 2 ** 20):
        from .pallas_scatter import scatter_add_rows
        return scatter_add_rows(rows, upd, n_rows=n_rows, accum_dtype=adt,
                                tile=2048)
    return jnp.zeros((n_rows, w), adt).at[rows].add(upd.astype(adt))


def _expand_brick_axis(g, axis: int, nb: int):
    """Split one corner axis [3*nb+1] into brick x corner axes [nb, 4].

    bricks[..., b, d, ...] = g[..., 3*b + d, ...] for d in 0..3: d in {0,1,2}
    is a pure reshape of the leading 3*nb entries; d == 3 is the stride-3
    slice starting at 3 (each brick's far corner = the next brick's near
    corner, which keeps corner sharing exact)."""
    pre, post = g.shape[:axis], g.shape[axis + 1:]
    main = jax.lax.slice_in_dim(g, 0, 3 * nb, axis=axis)
    main = main.reshape(pre + (nb, 3) + post)
    far = jax.lax.slice_in_dim(g, 3, 3 * nb + 1, 3, axis=axis)
    far = far.reshape(pre + (nb, 1) + post)
    return jnp.concatenate([main, far], axis=axis + 1)


def _materialize_dense_bricks(grid, n_bricks_axis: int):
    """Overlapping 4^3 windows of the canonical corner grid, stride 3.

    grid: [N, N, N, F] with N = 3*n_bricks_axis + 1.
    Returns [n_bricks_axis^3, 64 * F] in corner-major row layout
    (corner = dx*16 + dy*4 + dz). Three axis-wise reshape/concat expansions
    + one transpose — the earlier 64-strided-slices formulation spent ~15 ms
    per forward on tiny tile-padded slices (measured, v5e)."""
    nb = n_bricks_axis
    f = grid.shape[-1]
    g = _expand_brick_axis(grid, 0, nb)   # [nb,4,X,X,F]
    g = _expand_brick_axis(g, 2, nb)      # [nb,4,nb,4,X,F]
    g = _expand_brick_axis(g, 4, nb)      # [nb,4,nb,4,nb,4,F]
    g = g.transpose(0, 2, 4, 1, 3, 5, 6)  # [nb,nb,nb,4,4,4,F]
    return g.reshape(nb ** 3, CORNERS_PER_BRICK * f)


def _corner_weights(intra, frac, dtype, n_features: int = 1):
    """[N, 64 * n_features] trilinear weights in brick-corner-row layout.

    intra: [N, 3] int cell position within the brick (0..2);
    frac:  [N, 3] fractional position within the cell.
    Per-dim 4-vector w[k] = (k==i)*(1-f) + (k==i+1)*f; the 64-weight tensor
    is their outer product (corner index = dx*16 + dy*4 + dz). With
    n_features > 1 each weight is replicated across that corner's feature
    lanes (row layout [c0 f0..fF, c1 f0..fF, ...]) so the result multiplies a
    gathered table row elementwise — built directly at full row width so XLA
    fuses it into the consumer instead of materializing a repeat.
    """
    k = jnp.arange(BRICK_CORNERS, dtype=jnp.int32)
    lo = (k[None, None, :] == intra[:, :, None]).astype(dtype)
    hi = (k[None, None, :] == (intra[:, :, None] + 1)).astype(dtype)
    f = frac[:, :, None].astype(dtype)
    w = lo * (1.0 - f) + hi * f  # [N, 3, 4]
    if n_features == 1:
        w64 = (
            w[:, 0, :, None, None] * w[:, 1, None, :, None]
            * w[:, 2, None, None, :]
        )  # [N, 4, 4, 4]
        return w64.reshape(-1, CORNERS_PER_BRICK)
    # F > 1: compare-build each axis factor directly at full lane width and
    # multiply. The earlier [N,4,4,4,1] -> broadcast -> reshape form landed
    # the [N, 64F] result in a {0,1} layout that XLA then physically
    # transposed to {1,0} — one 1.6 ms copy per instance at 1M samples on
    # v5e (trace 2026-08-19).
    wa = [_lane_axis_weights_2d(a, intra[:, a], frac[:, a], dtype,
                                n_features, False)[0] for a in range(3)]
    return (wa[0] * wa[1]) * wa[2]


def _feature_selector(n_features: int, dtype, n_corners: int = CORNERS_PER_BRICK):
    """Static [C*F, F] 0/1 matrix: row c*F+f -> column f.

    (g * w_row) @ selector sums each feature's C weighted corners with one
    skinny MXU matmul — the TPU-friendly form of the per-sample interpolation
    reduce (batched-matvec einsums lower poorly)."""
    rows = np.arange(n_corners * n_features)
    sel = (rows[:, None] % n_features == np.arange(n_features)[None, :])
    return jnp.asarray(sel.astype(np.float32), dtype)


def _expand_feat_lanes(g, n_features: int, n_corners: int = CORNERS_PER_BRICK):
    """Replicate per-feature values across corner lanes: [N, F] -> [N, C*F].

    out[:, c*F + f] = g[:, f], built by compare-select against the constant
    lane->feature index — pure 2-D elementwise ops at full row width that
    XLA fuses into the consumer. The broadcast([N,1,F])->reshape form
    materializes the result in a {0,1} layout and pays a physical {1,0}
    transpose copy (~1.6 ms per instance at 1M samples on v5e)."""
    if n_features == 1:
        return jnp.broadcast_to(g, (g.shape[0], n_corners))
    lane_feat = jnp.asarray(
        np.arange(n_corners * n_features) % n_features, jnp.int32
    )[None, :]
    out = jnp.broadcast_to(g[:, 0:1], (g.shape[0], lane_feat.shape[1]))
    for f in range(1, n_features):
        out = jnp.where(lane_feat == f, g[:, f:f + 1], out)
    return out


def _corner_sum_selector(n_features: int, dtype):
    """Static [64*F, 64] 0/1 matrix: row c*F+f -> column c.

    (feats * gout) @ selector sums each corner's F feature lanes with one
    skinny MXU matmul, collapsing the full-width row to one value per corner
    — the entry point of the narrow (64-lane) position-gradient algebra."""
    sel = np.kron(np.eye(CORNERS_PER_BRICK, dtype=np.float32),
                  np.ones((n_features, 1), np.float32))
    return jnp.asarray(sel, dtype)


def _level_rows_and_weights(x, lvl: int, lay: dict, spec: BrickGridSpec,
                            full_width: bool = False,
                            weight_dtype=jnp.float32):
    """Brick row index + corner weights for one level. x: [N, 3] in [0,1].

    full_width=True returns weights at the gathered-row width
    (64 * n_features, feature lanes replicated) for elementwise use.
    weight_dtype: the outer-product weights (and hence their backward
    intermediates, which dominate the input-position gradient cost) are
    built in this dtype; bf16 on TPU halves that traffic at ~8-bit mantissa
    position-grad precision (the reference's fp16 tcnn grads are comparable,
    hash_encoder_half.py:164-227)."""
    scale = level_scale(lvl, spec.log_b, spec.base_res)
    pos = x * jnp.asarray(scale, x.dtype) + 0.5
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    cell = pos_grid.astype(jnp.int32)
    # clamp into the covered lattice so out-of-box points stay valid
    cell = jnp.clip(cell, 0, lay["n_bricks_axis"] * BRICK_CELLS - 1)
    brick = cell // BRICK_CELLS
    intra = cell - brick * BRICK_CELLS

    if lay["hashed"]:
        b = brick.astype(jnp.uint32)
        h = (
            b[:, 0] * jnp.uint32(_PRIMES[0])
            ^ b[:, 1] * jnp.uint32(_PRIMES[1])
            ^ b[:, 2] * jnp.uint32(_PRIMES[2])
        )
        rows = (h % jnp.uint32(lay["rows"])).astype(jnp.int32)
    else:
        nb = lay["n_bricks_axis"]
        rows = (brick[:, 0] * nb + brick[:, 1]) * nb + brick[:, 2]
    weights = _corner_weights(intra, frac.astype(weight_dtype), weight_dtype,
                              n_features=spec.n_features if full_width else 1)
    return rows, weights


def _level_geom(x, scale: float, nb: int, hashed: bool, n_rows: int):
    """Rows + intra-brick cell + fraction for one level (recomputable).

    Returns (rows [N] i32, intra [N,3] i32, frac [N,3] f32,
    ok [N,3] f32 -- 1 where the cell was not edge-clamped, gating d_x)."""
    pos = x.astype(jnp.float32) * jnp.float32(scale) + 0.5
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    cell_raw = pos_grid.astype(jnp.int32)
    hi = nb * BRICK_CELLS - 1
    cell = jnp.clip(cell_raw, 0, hi)
    ok = ((cell_raw >= 0) & (cell_raw <= hi)).astype(jnp.float32)
    brick = cell // BRICK_CELLS
    intra = cell - brick * BRICK_CELLS
    if hashed:
        b = brick.astype(jnp.uint32)
        h = (
            b[:, 0] * jnp.uint32(_PRIMES[0])
            ^ b[:, 1] * jnp.uint32(_PRIMES[1])
            ^ b[:, 2] * jnp.uint32(_PRIMES[2])
        )
        rows = (h % jnp.uint32(n_rows)).astype(jnp.int32)
    else:
        rows = (brick[:, 0] * nb + brick[:, 1]) * nb + brick[:, 2]
    return rows, intra, frac, ok


def _axis_factors(intra, frac, dtype):
    """Per-axis 4-corner weights and their d/dfrac. [N,3,4] each."""
    k = jnp.arange(BRICK_CORNERS, dtype=jnp.int32)
    lo = (k[None, None, :] == intra[:, :, None]).astype(dtype)
    hi = (k[None, None, :] == (intra[:, :, None] + 1)).astype(dtype)
    f = frac[:, :, None].astype(dtype)
    w = lo * (1.0 - f) + hi * f
    dw = hi - lo
    return w, dw


def _w_lanes(w, n_features: int):
    """Outer product of per-axis factors, expanded to row lanes [N, 64*F]."""
    wf = (
        w[:, 0, :, None, None, None] * w[:, 1, None, :, None, None]
        * w[:, 2, None, None, :, None]
    )
    n = w.shape[0]
    wf = jnp.broadcast_to(
        wf, (n, BRICK_CORNERS, BRICK_CORNERS, BRICK_CORNERS, n_features)
    )
    return wf.reshape(n, CORNERS_PER_BRICK * n_features)


def _lane_axis_weights_2d(axis: int, intra_a, frac_a, dtype, n_features: int,
                          with_d: bool):
    """Single-level lane-domain axis weights: [N, 64*F] (and d/dfrac).

    Compare-built directly at row width (see _axis_lane_weights): every
    intermediate has a 64F-wide minor dim, which tiles cleanly — the
    outer-product construction's [N,4,4,4(,F)] intermediates pad 8-32x under
    TPU (8,128) tiling when XLA materializes them."""
    k = _lane_axis_index(axis, n_features)[None, :]
    ia = intra_a[:, None]
    fa = frac_a[:, None].astype(dtype)
    lo = (k == ia)
    hi = (k == ia + 1)
    w = jnp.where(lo, 1.0 - fa, jnp.zeros((), dtype))
    w = jnp.where(hi, fa, w)
    dw = (hi.astype(dtype) - lo.astype(dtype)) if with_d else None
    return w, dw


@functools.lru_cache(maxsize=None)
def _make_level_encode(scale: float, nb: int, hashed: bool, n_rows: int,
                       n_feat: int, dtype_name: str,
                       table_dtype_name: str = "float32",
                       dx_impl: str = "hybrid",
                       accum_dtype_name: str = "float32",
                       scatter_impl: str = "xla",
                       remat_feats: bool = False):
    """Analytic custom-VJP single-level encode: (table, x) -> [N, F].

    The autodiff backward through the trilinear-weight outer product
    materializes [N, 4,4,4, F] intermediates and explodes XLA compile time;
    this VJP instead recomputes geometry (pointwise), scatters
    `w * dL/dout` into the table, and contracts `gathered * dL/dout` with the
    per-axis derivative weights for the input-position gradient — no saved
    activations at all (residuals are just (table, x)). Math parity target:
    the reference Taichi backward (hash_encoder_half.py:164-227), which
    computes the same two gradients.
    """
    cdtype = jnp.dtype(dtype_name)
    F = n_feat
    W = CORNERS_PER_BRICK * F
    # 'hybrid'/'cmp' (default): compare-built lane weights in BOTH passes.
    # The outer-product forward measured marginally faster at 262k samples,
    # but its [N,4,4,4,F] broadcast+reshape materializes the [N, 64F]
    # weights in a {0,1} layout that XLA physically transposes (1.6 ms per
    # copy at 1M on v5e, trace 2026-08-19); compare-built factors fuse into
    # the gather/scatter consumers with no materialization at all.
    cmp_fwd = dx_impl in ("cmp", "hybrid")
    cmp_bwd = dx_impl in ("cmp", "hybrid")

    def cmp_lanes(intra, frac, with_d: bool):
        ws, dws = [], []
        for a in range(3):
            w, dw = _lane_axis_weights_2d(a, intra[:, a], frac[:, a], cdtype,
                                          F, with_d)
            ws.append(w)
            dws.append(dw)
        return ws, dws

    def fwd_impl(table, x):
        rows, intra, frac, _ = _level_geom(x, scale, nb, hashed, n_rows)
        if cmp_fwd:
            (wx, wy, wz), _ = cmp_lanes(intra, frac, False)
            w_full = wx * wy * wz
        else:
            w, _ = _axis_factors(intra, frac, cdtype)
            w_full = _w_lanes(w, F)
        feats = jnp.take(table.astype(cdtype), rows, axis=0)
        sel = _feature_selector(F, cdtype)
        out = jnp.dot(feats * w_full, sel, preferred_element_type=jnp.float32)
        return out.astype(cdtype), feats

    @jax.custom_vjp
    def enc(table, x):
        return fwd_impl(table, x)[0]

    def fwd(table, x):
        # default: saving the gathered rows (bf16) costs one linear HBM
        # write/read, cheaper than re-gathering 1 row/sample in the
        # backward. remat_feats flips that trade: keep only (x, table) and
        # re-gather — the per-sample residual memory is what binds at
        # multi-million-sample budgets.
        if remat_feats:
            return fwd_impl(table, x)[0], (x, table)
        out, feats = fwd_impl(table, x)
        return out, (x, feats)

    def _res_feats(res_tf, rows):
        """Residual -> gathered rows (re-gather under remat_feats)."""
        if remat_feats:
            return jnp.take(res_tf.astype(cdtype), rows, axis=0)
        return res_tf

    def bwd_cmp(res, g):
        x, tf = res
        rows, intra, frac, ok = _level_geom(x, scale, nb, hashed, n_rows)
        feats = _res_feats(tf, rows)
        adt0 = jnp.dtype(accum_dtype_name)
        if (scatter_impl == "fused" and x.shape[0] % 1024 == 0
                and n_rows * W * adt0.itemsize <= 12 * 2 ** 20):
            # one Pallas pass: lane math + VMEM-resident accumulator —
            # the update rows never touch HBM (ops/pallas_encoder.py)
            from .pallas_encoder import interp_bwd_fused
            d_table, d_x = interp_bwd_fused(
                x, g, feats, rows, scale=scale, nb=nb, n_rows=n_rows,
                n_feat=F, compute_dtype=cdtype, accum_dtype=adt0)
            return (d_table.astype(jnp.dtype(table_dtype_name)),
                    d_x.astype(x.dtype))
        # Full-width weights feed ONLY the scatter's update rows, so XLA
        # fuses their construction into the scatter — no [N, W] HBM arrays.
        # gout is compare-select-built at lane width (shared by the scatter
        # and the h64 matmul); the broadcast-reshape form paid a physical
        # layout-transpose copy per level (trace 2026-08-19).
        (wx, wy, wz), _ = cmp_lanes(intra, frac, False)
        gout = _expand_feat_lanes(g.astype(cdtype), F)
        upd = (wx * wy * wz) * gout
        adt = jnp.dtype(accum_dtype_name)
        d_table = _scatter_rows(rows, upd, n_rows, adt, scatter_impl)
        # Narrow position-gradient path: one skinny MXU matmul reduces the
        # feature lanes ([N, W] @ [W, 64]), then all d_x algebra runs at
        # 64-lane width. The wide form shared its [N, W] weight/dw arrays
        # with the scatter fusion, materializing ~7 of them per level
        # (~14 ms/level at 1M samples on v5e); this form materializes h64
        # ([N, 64]) only.
        h64 = jnp.dot(feats * gout, _corner_sum_selector(F, cdtype),
                      preferred_element_type=jnp.float32).astype(cdtype)
        ws64, dws64 = [], []
        for a in range(3):
            w1, dw1 = _lane_axis_weights_2d(a, intra[:, a], frac[:, a],
                                            cdtype, 1, True)
            ws64.append(w1)
            dws64.append(dw1)

        d_frac = _axis_sum_matmul(
            [h64 * dws64[0] * ws64[1] * ws64[2],
             h64 * ws64[0] * dws64[1] * ws64[2],
             h64 * ws64[0] * ws64[1] * dws64[2]], cdtype)
        d_x = d_frac * jnp.float32(scale) * ok
        return (d_table.astype(jnp.dtype(table_dtype_name)),
                d_x.astype(x.dtype))

    def bwd(res, g):
        if cmp_bwd:
            return bwd_cmp(res, g)
        x, tf = res
        n = x.shape[0]
        rows, intra, frac, ok = _level_geom(x, scale, nb, hashed, n_rows)
        feats = _res_feats(tf, rows)
        w, dw = _axis_factors(intra, frac, cdtype)
        gout = jnp.tile(g.astype(cdtype), (1, CORNERS_PER_BRICK))  # [N, 64F]
        upd = _w_lanes(w, F) * gout
        adt = jnp.dtype(accum_dtype_name)
        d_table = _scatter_rows(rows, upd, n_rows, adt, scatter_impl)
        # Position gradient in fused lane form: d_frac_a = sum over row lanes
        # of (feats * gout) * (dW/dfrac_a lanes), where the derivative-weight
        # lanes substitute dw for w on axis a. Each axis is one [N, 64F]
        # elementwise+reduce pass that XLA fuses (the earlier [N,4,4,4]
        # contraction materialized several 67 MB intermediates per level and
        # dominated the whole backward).
        wx, wy, wz = w[:, 0], w[:, 1], w[:, 2]
        dwx, dwy, dwz = dw[:, 0], dw[:, 1], dw[:, 2]
        if dx_impl == "lanes":
            h = feats * gout  # [N, 64F]

            def lane_dot(ax_, ay_, az_):
                lanes = (
                    ax_[:, :, None, None] * ay_[:, None, :, None]
                    * az_[:, None, None, :]
                )  # [N, 4, 4, 4]
                lanes = jnp.broadcast_to(
                    lanes[..., None],
                    (n, BRICK_CORNERS, BRICK_CORNERS, BRICK_CORNERS, F),
                ).reshape(n, W)
                return jnp.sum((h * lanes).astype(jnp.float32), axis=-1)

            d_frac = jnp.stack(
                [lane_dot(dwx, wy, wz), lane_dot(wx, dwy, wz),
                 lane_dot(wx, wy, dwz)], axis=-1)
        else:  # "contract": reduce features first, contract the 4^3 cube
            hf = jnp.sum(
                (feats * gout).reshape(n, BRICK_CORNERS, BRICK_CORNERS,
                                       BRICK_CORNERS, F),
                axis=-1)  # [N,4,4,4]

            def contract(ax_, ay_, az_):
                t = hf * ax_[:, :, None, None] * ay_[:, None, :, None] \
                    * az_[:, None, None, :]
                return jnp.sum(t, axis=(1, 2, 3)).astype(jnp.float32)

            d_frac = jnp.stack(
                [contract(dwx, wy, wz), contract(wx, dwy, wz),
                 contract(wx, wy, dwz)], axis=-1)
        d_x = d_frac * jnp.float32(scale) * ok
        return d_table.astype(jnp.dtype(table_dtype_name)), d_x.astype(x.dtype)

    enc.defvjp(fwd, bwd)
    return enc


# --------------------------------------------------------------------- #
# Cell-row layout: the brick stores 4^3 corners covering 3^3 cells, so a
# sample's interpolation touches only 8 of a gathered row's 64 corners —
# 7/8 of every [N, 64F] gather/scatter/lane-math pass is dead lanes. The
# cell layout re-materializes each level's table per step as one row per
# (brick, cell) holding just that cell's 8 corners ([rows*27, 8F], built
# by a single ~29 GFLOP MXU expansion matmul from the canonical brick
# table — table-sized, not sample-sized), so every per-sample op runs at
# 8F lanes instead of 64F. The backward folds the per-cell table gradient
# back onto shared corners through the expansion matmul's autodiff
# (exact: corners shared by adjacent cells sum their contributions).
# Same math as the reference's per-corner NGP loop
# (hash_encoder_half.py:137-160) with the hashing still at brick
# granularity; hashed 3D levels only (dense levels keep the brick layout
# + the one-hot tiny-table grad path).
# --------------------------------------------------------------------- #

CELLS_PER_BRICK = BRICK_CELLS ** 3   # 27
CELL_CORNERS = 8


@functools.lru_cache(maxsize=None)
def _cell_expand_matrix(n_features: int):
    """Static [64F, 27*8F] 0/1: brick corner lanes -> per-cell corner lanes.

    Brick lane = (X*16 + Y*4 + Z)*F + f; cell lane = (cell*8 + d)*F + f
    with cell = (cx*3+cy)*3+cz, d = dx*4+dy*2+dz, (X,Y,Z) = (cx,cy,cz) +
    (dx,dy,dz)."""
    F = n_features
    e = np.zeros((CORNERS_PER_BRICK * F, CELLS_PER_BRICK * CELL_CORNERS * F),
                 np.float32)
    for cx in range(BRICK_CELLS):
        for cy in range(BRICK_CELLS):
            for cz in range(BRICK_CELLS):
                cell = (cx * BRICK_CELLS + cy) * BRICK_CELLS + cz
                for dx in range(2):
                    for dy in range(2):
                        for dz in range(2):
                            d = dx * 4 + dy * 2 + dz
                            corner = ((cx + dx) * BRICK_CORNERS + (cy + dy)) \
                                * BRICK_CORNERS + (cz + dz)
                            for f in range(F):
                                e[corner * F + f,
                                  (cell * CELL_CORNERS + d) * F + f] = 1.0
    return e


def _expand_cell_table(table, n_features: int):
    """[rows, 64F] brick table -> [rows*27, 8F] per-cell table (one MXU dot).

    Differentiable: the transpose matmul in the backward sums each corner's
    gradient contributions from every cell row that replicated it."""
    e = jnp.asarray(_cell_expand_matrix(n_features), table.dtype)
    rows = table.shape[0]
    out = jnp.dot(table, e, preferred_element_type=jnp.float32)
    return out.astype(table.dtype).reshape(
        rows * CELLS_PER_BRICK, CELL_CORNERS * n_features)


def _cell_axis_bit(axis: int, n_features: int):
    """Constant [8F] int: per lane, its corner's 0/1 offset along `axis`."""
    lane = np.arange(CELL_CORNERS * n_features)
    d = lane // n_features
    bit = (d >> (2 - axis)) & 1
    return jnp.asarray(bit, jnp.int32)


def _axis_sum_matmul(terms, cdtype):
    """Sum each [N, W] term over its lane axis in ONE MXU matmul -> [N, K].

    A lane-axis reduction with a 1-D [N] output pays a fixed ~2-3 ms
    retiling floor per op at 1M samples on v5e (tools/profile_layouts.py;
    the 2026-08-19 trace of the promoted default shows 18 such
    convert_reduce fusions = ~59 ms/step, 19% of the step). Concatenating
    the K terms to [N, K*W] and contracting with the constant
    block-diagonal kron(I_K, 1_W) keeps the output 2-D and the work on the
    MXU (f32 accumulation, same product rounding; only the f32 summation
    ORDER differs from jnp.sum)."""
    k = len(terms)
    w = terms[0].shape[-1]
    x = jnp.concatenate(terms, axis=-1)
    blocks = jnp.asarray(np.kron(np.eye(k), np.ones((w, 1))), cdtype)
    return jnp.dot(x, blocks, preferred_element_type=jnp.float32)


def _make_level_encode_cell(scale: float, nb: int, hashed: bool, n_rows: int,
                            n_feat: int, dtype_name: str,
                            table_dtype_name: str = "float32",
                            accum_dtype_name: str = "float32",
                            scatter_impl: str = "xla",
                            remat_feats: bool = False):
    """Analytic custom-VJP cell-row level encode: (cell_table, x) -> [N, F].

    cell_table: [n_rows*27, 8F] from _expand_cell_table. Gathers ONE 8F-lane
    row per sample and runs all interpolation/backward lane math at 8F
    width. Math parity: identical corner weights/gradients to
    _make_level_encode (the 56 dead brick lanes there carry zero weight);
    the table gradient lands on the per-cell rows and is folded to brick
    corners by the expansion matmul's autodiff."""
    cdtype = jnp.dtype(dtype_name)
    F = n_feat
    W = CELL_CORNERS * F
    bits = [_cell_axis_bit(a, F)[None, :] for a in range(3)]

    def axis_w(frac, a):
        fa = frac[:, a][:, None].astype(cdtype)
        return jnp.where(bits[a] == 1, fa, 1.0 - fa)

    def crow_of(rows, intra):
        return rows * CELLS_PER_BRICK + (
            (intra[:, 0] * BRICK_CELLS + intra[:, 1]) * BRICK_CELLS
            + intra[:, 2])

    def fwd_impl(cell, x):
        rows, intra, frac, _ = _level_geom(x, scale, nb, hashed, n_rows)
        crow = crow_of(rows, intra)
        feats = jnp.take(cell.astype(cdtype), crow, axis=0)
        w = (axis_w(frac, 0) * axis_w(frac, 1)) * axis_w(frac, 2)
        sel = _feature_selector(F, cdtype, CELL_CORNERS)
        out = jnp.dot(feats * w, sel, preferred_element_type=jnp.float32)
        return out.astype(cdtype), feats

    @jax.custom_vjp
    def enc(cell, x):
        return fwd_impl(cell, x)[0]

    def fwd(cell, x):
        if remat_feats:
            return fwd_impl(cell, x)[0], (x, cell)
        out, feats = fwd_impl(cell, x)
        return out, (x, feats)

    def bwd(res, g):
        x, tf = res
        rows, intra, frac, ok = _level_geom(x, scale, nb, hashed, n_rows)
        crow = crow_of(rows, intra)
        if remat_feats:
            feats = jnp.take(tf.astype(cdtype), crow, axis=0)
        else:
            feats = tf
        wx, wy, wz = (axis_w(frac, a) for a in range(3))
        gout = _expand_feat_lanes(g.astype(cdtype), F, CELL_CORNERS)
        upd = ((wx * wy) * wz) * gout
        adt = jnp.dtype(accum_dtype_name)
        d_cell = _scatter_rows(crow, upd, n_rows * CELLS_PER_BRICK, adt,
                               scatter_impl)
        # position gradient: dw/dfrac_a swaps that axis's factor for +-1;
        # the three lane sums run as one MXU contraction (_axis_sum_matmul)
        h = feats * gout
        sgn = [jnp.where(bits[a] == 1, jnp.ones((), cdtype),
                         -jnp.ones((), cdtype)) for a in range(3)]
        d_frac = _axis_sum_matmul([
            h * sgn[0] * wy * wz,
            h * wx * sgn[1] * wz,
            h * wx * wy * sgn[2],
        ], cdtype)
        d_x = d_frac * jnp.float32(scale) * ok
        return (d_cell.astype(jnp.dtype(table_dtype_name)),
                d_x.astype(x.dtype))

    enc.defvjp(fwd, bwd)
    return enc


# --------------------------------------------------------------------- #
# z-packed cell rows ("cellz"): one physical row per (brick, cx, cy)
# holding the full z-column of 3 cells (24F lanes; 96 at F=4). Motivation
# (profile_scatter_rows / session-8 lane-width probe, v5e): XLA's per-row
# take from a 442k-row table costs ~10 ms/M rows at W=32 but ~4.7-4.9 ms
# at W=64-128 — the narrow cell row leaves half the gather rate on the
# table. The target cell is selected by a lane-constant compare folded
# into the z-axis weight, so the math is bit-identical to `cell` (the
# other two cells' lanes carry zero weight).
# --------------------------------------------------------------------- #

ZROWS_PER_BRICK = BRICK_CELLS * BRICK_CELLS   # 9
CELLZ_CORNERS = BRICK_CELLS * CELL_CORNERS    # 24 corner lanes per row


@functools.lru_cache(maxsize=None)
def _cellz_expand_matrix(n_features: int):
    """Static [64F, 9*24F] 0/1: brick corner lanes -> z-packed cell rows.

    Sub-row = cx*3 + cy; lane = (cz*8 + d)*F + f with d = dx*4 + dy*2 + dz,
    (X,Y,Z) = (cx,cy,cz) + (dx,dy,dz)."""
    F = n_features
    e = np.zeros((CORNERS_PER_BRICK * F,
                  ZROWS_PER_BRICK * CELLZ_CORNERS * F), np.float32)
    for cx in range(BRICK_CELLS):
        for cy in range(BRICK_CELLS):
            zr = cx * BRICK_CELLS + cy
            for cz in range(BRICK_CELLS):
                for dx in range(2):
                    for dy in range(2):
                        for dz in range(2):
                            d = dx * 4 + dy * 2 + dz
                            corner = ((cx + dx) * BRICK_CORNERS + (cy + dy)) \
                                * BRICK_CORNERS + (cz + dz)
                            for f in range(F):
                                e[corner * F + f,
                                  (zr * CELLZ_CORNERS
                                   + cz * CELL_CORNERS + d) * F + f] = 1.0
    return e


def _expand_cellz_table(table, n_features: int):
    """[rows, 64F] brick table -> [rows*9, 24F] z-packed cell table.

    Differentiable like _expand_cell_table: the transpose matmul in the
    backward folds each corner's gradient from every z-row replicating it."""
    e = jnp.asarray(_cellz_expand_matrix(n_features), table.dtype)
    rows = table.shape[0]
    out = jnp.dot(table, e, preferred_element_type=jnp.float32)
    return out.astype(table.dtype).reshape(
        rows * ZROWS_PER_BRICK, CELLZ_CORNERS * n_features)


def _cellz_lane_cell(n_features: int):
    """Constant [24F] int: per lane, its cell's z index within the row."""
    lane = np.arange(CELLZ_CORNERS * n_features)
    return jnp.asarray(lane // (CELL_CORNERS * n_features), jnp.int32)


def _cellz_axis_bit(axis: int, n_features: int):
    """Constant [24F] int: per lane, its corner's 0/1 offset along `axis`."""
    lane = np.arange(CELLZ_CORNERS * n_features)
    d = (lane // n_features) % CELL_CORNERS
    return jnp.asarray((d >> (2 - axis)) & 1, jnp.int32)


def _make_level_encode_cellz(scale: float, nb: int, hashed: bool, n_rows: int,
                             n_feat: int, dtype_name: str,
                             table_dtype_name: str = "float32",
                             accum_dtype_name: str = "float32",
                             scatter_impl: str = "xla",
                             remat_feats: bool = False):
    """Analytic custom-VJP z-packed cell-row level encode: see module note.

    cellz_table: [n_rows*9, 24F] from _expand_cellz_table. Math parity with
    _make_level_encode_cell: identical corner weights/gradients (the two
    off-cell groups of 8F lanes carry zero weight via the cell_match factor
    in the z-axis weight)."""
    cdtype = jnp.dtype(dtype_name)
    F = n_feat
    bits = [_cellz_axis_bit(a, F)[None, :] for a in range(3)]
    lane_cz = _cellz_lane_cell(F)[None, :]

    def axis_w(frac, a):
        fa = frac[:, a][:, None].astype(cdtype)
        return jnp.where(bits[a] == 1, fa, 1.0 - fa)

    def zrow_cz_of(rows, intra):
        zrow = rows * ZROWS_PER_BRICK \
            + intra[:, 0] * BRICK_CELLS + intra[:, 1]
        return zrow, intra[:, 2]

    def cell_match(cz):
        return (lane_cz == cz[:, None]).astype(cdtype)

    def fwd_impl(cellz, x):
        rows, intra, frac, _ = _level_geom(x, scale, nb, hashed, n_rows)
        zrow, cz = zrow_cz_of(rows, intra)
        feats = jnp.take(cellz.astype(cdtype), zrow, axis=0)
        w = ((axis_w(frac, 0) * axis_w(frac, 1))
             * (axis_w(frac, 2) * cell_match(cz)))
        sel = _feature_selector(F, cdtype, CELLZ_CORNERS)
        out = jnp.dot(feats * w, sel, preferred_element_type=jnp.float32)
        return out.astype(cdtype), feats

    @jax.custom_vjp
    def enc(cellz, x):
        return fwd_impl(cellz, x)[0]

    def fwd(cellz, x):
        if remat_feats:
            return fwd_impl(cellz, x)[0], (x, cellz)
        out, feats = fwd_impl(cellz, x)
        return out, (x, feats)

    def bwd(res, g):
        x, tf = res
        rows, intra, frac, ok = _level_geom(x, scale, nb, hashed, n_rows)
        zrow, cz = zrow_cz_of(rows, intra)
        if remat_feats:
            feats = jnp.take(tf.astype(cdtype), zrow, axis=0)
        else:
            feats = tf
        m = cell_match(cz)
        wx, wy = axis_w(frac, 0), axis_w(frac, 1)
        wzm = axis_w(frac, 2) * m
        gout = _expand_feat_lanes(g.astype(cdtype), F, CELLZ_CORNERS)
        upd = ((wx * wy) * wzm) * gout
        adt = jnp.dtype(accum_dtype_name)
        d_cell = _scatter_rows(zrow, upd, n_rows * ZROWS_PER_BRICK, adt,
                               scatter_impl)
        h = feats * gout
        sgn = [jnp.where(bits[a] == 1, jnp.ones((), cdtype),
                         -jnp.ones((), cdtype)) for a in range(3)]
        d_frac = _axis_sum_matmul([
            h * sgn[0] * wy * wzm,
            h * wx * sgn[1] * wzm,
            h * wx * wy * (sgn[2] * m),
        ], cdtype)
        d_x = d_frac * jnp.float32(scale) * ok
        return (d_cell.astype(jnp.dtype(table_dtype_name)),
                d_x.astype(x.dtype))

    enc.defvjp(fwd, bwd)
    return enc


def _fused_cell_geom(x, scales, nbs, hashed, rows_n, offsets):
    """Batched per-level CELL-row geometry. x: [N,3]; static per-level tuples.

    Returns (crow [N,L] i32 into the concatenated cell table — row =
    offset + brick_row*27 + cell_index, frac [N,L,3] f32, ok [N,L,3] f32).
    Same math as _level_geom + crow_of in _make_level_encode_cell, batched
    over a level axis so L levels share one gather/scatter downstream."""
    sc = jnp.asarray(scales, jnp.float32)            # [L]
    nb = jnp.asarray(nbs, jnp.int32)                 # [L]
    hm = jnp.asarray(hashed, bool)                   # [L]
    rn = jnp.asarray(rows_n, jnp.uint32)             # [L]
    off = jnp.asarray(offsets, jnp.int32)            # [L]

    pos = x.astype(jnp.float32)[:, None, :] * sc[None, :, None] + 0.5
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid                             # [N,L,3]
    cell_raw = pos_grid.astype(jnp.int32)
    hi = (nb * BRICK_CELLS - 1)[None, :, None]
    cell = jnp.clip(cell_raw, 0, hi)
    ok = ((cell_raw >= 0) & (cell_raw <= hi)).astype(jnp.float32)
    brick = cell // BRICK_CELLS
    intra = cell - brick * BRICK_CELLS

    b = brick.astype(jnp.uint32)
    h = (
        b[..., 0] * jnp.uint32(_PRIMES[0])
        ^ b[..., 1] * jnp.uint32(_PRIMES[1])
        ^ b[..., 2] * jnp.uint32(_PRIMES[2])
    )
    hrows = (h % rn[None, :]).astype(jnp.int32)
    drows = (brick[..., 0] * nb[None, :] + brick[..., 1]) * nb[None, :] \
        + brick[..., 2]
    rows = jnp.where(hm[None, :], hrows, drows)
    cidx = (intra[..., 0] * BRICK_CELLS + intra[..., 1]) * BRICK_CELLS \
        + intra[..., 2]
    crow = rows * CELLS_PER_BRICK + cidx + off[None, :]
    return crow, frac, ok


@functools.lru_cache(maxsize=None)
def _make_cell_fused_encode(scales, nbs, hashed, rows_n, offsets,
                            total_rows: int, n_feat: int, dtype_name: str,
                            table_dtype_name: str = "float32",
                            accum_dtype_name: str = "float32",
                            scatter_impl: str = "xla",
                            remat_feats: bool = False):
    """Analytic custom-VJP LEVEL-FUSED cell encode: (cell [R,8F], x) -> [N,L*F].

    One row gather + ONE table-grad scatter for all L levels (cell-row
    layout). Why: XLA row gathers/scatters carry a ~2.5-5 ms FIXED cost per
    op on v5e on top of the per-row marginal cost (ROADMAP measurements), so
    the per-level cell path pays that fixed cost 2L times per step. The
    brick-layout fused experiment lost to per-level because 8 MB brick
    tables stay cache-resident; cell tables are 27x larger, so residency is
    moot and only the fixed-cost saving remains. Bit-identical math to
    _make_level_encode_cell per level (gated by tests/test_brick_grid.py).
    """
    cdtype = jnp.dtype(dtype_name)
    F = n_feat
    W = CELL_CORNERS * F
    L = len(scales)
    bits = [_cell_axis_bit(a, F)[None, :] for a in range(3)]

    def axis_w(frac2, a):
        fa = frac2[:, a][:, None].astype(cdtype)      # [N*L, 1]
        return jnp.where(bits[a] == 1, fa, 1.0 - fa)

    def geom(x):
        crow, frac, ok = _fused_cell_geom(x, scales, nbs, hashed, rows_n,
                                          offsets)
        n = x.shape[0]
        return crow.reshape(n * L), frac.reshape(n * L, 3), ok

    def fwd_impl(cell, x):
        n = x.shape[0]
        crow, frac2, _ = geom(x)
        feats = jnp.take(cell.astype(cdtype), crow, axis=0)   # [N*L, 8F]
        w = (axis_w(frac2, 0) * axis_w(frac2, 1)) * axis_w(frac2, 2)
        sel = _feature_selector(F, cdtype, CELL_CORNERS)
        out = jnp.dot(feats * w, sel, preferred_element_type=jnp.float32)
        return out.reshape(n, L * F).astype(cdtype), feats

    @jax.custom_vjp
    def enc(cell, x):
        return fwd_impl(cell, x)[0]

    def fwd(cell, x):
        if remat_feats:
            return fwd_impl(cell, x)[0], (x, cell)
        out, feats = fwd_impl(cell, x)
        return out, (x, feats)

    def bwd(res, g):
        x, tf = res
        n = x.shape[0]
        crow, frac2, ok = geom(x)
        if remat_feats:
            feats = jnp.take(tf.astype(cdtype), crow, axis=0)
        else:
            feats = tf
        wx, wy, wz = (axis_w(frac2, a) for a in range(3))
        gout = _expand_feat_lanes(g.astype(cdtype).reshape(n * L, F), F,
                                  CELL_CORNERS)
        upd = ((wx * wy) * wz) * gout
        adt = jnp.dtype(accum_dtype_name)
        d_cell = _scatter_rows(crow, upd, total_rows, adt, scatter_impl)
        h = feats * gout
        sgn = [jnp.where(bits[a] == 1, jnp.ones((), cdtype),
                         -jnp.ones((), cdtype)) for a in range(3)]
        d_frac = _axis_sum_matmul([
            h * sgn[0] * wy * wz,
            h * wx * sgn[1] * wz,
            h * wx * wy * sgn[2],
        ], cdtype).reshape(n, L, 3)
        sc = jnp.asarray(scales, jnp.float32)
        d_x = jnp.sum(d_frac * sc[None, :, None] * ok, axis=1)
        return (d_cell.astype(jnp.dtype(table_dtype_name)),
                d_x.astype(x.dtype))

    enc.defvjp(fwd, bwd)
    return enc


def _make_level_encode_cell_4d(scale: float, nb: int, hashed: bool,
                               n_rows: int, n_feat: int, keyframes: int,
                               dtype_name: str,
                               table_dtype_name: str = "float32",
                               accum_dtype_name: str = "float32",
                               scatter_impl: str = "xla",
                               remat_feats: bool = False):
    """Cell-row variant of _make_level_encode_4d: (cell4, x, t) -> [N, F].

    cell4: [(n_rows*K)*27, 8F] from _expand_cell_table of the flat
    keyframe-interleaved table — cell row index = (row*K + k)*27 + cell,
    so the upper keyframe sits exactly 27 rows above the lower. Two 8F-lane
    gathers + keyframe lerp + the 8F-lane interpolation; backward mirrors
    the 3D cell path plus the (1-t_frac)/t_frac cotangent split
    (hash_encoder_inter.py:202-276) and the analytic d_t."""
    cdtype = jnp.dtype(dtype_name)
    F = n_feat
    W = CELL_CORNERS * F
    K = keyframes
    bits = [_cell_axis_bit(a, F)[None, :] for a in range(3)]

    def axis_w(frac, a):
        fa = frac[:, a][:, None].astype(cdtype)
        return jnp.where(bits[a] == 1, fa, 1.0 - fa)

    def crow_lo_of(rows, intra, idx_lo):
        cell = (intra[:, 0] * BRICK_CELLS + intra[:, 1]) * BRICK_CELLS \
            + intra[:, 2]
        return (rows * K + idx_lo) * CELLS_PER_BRICK + cell

    def time_geom(t):
        t_scaled = t.reshape(-1) * (K - 1)
        idx_lo = jnp.clip(jnp.floor(t_scaled), 0, K - 2).astype(jnp.int32)
        t_frac = (t_scaled - idx_lo.astype(t_scaled.dtype)).astype(jnp.float32)
        return idx_lo, t_frac

    def fwd_impl(cell4, x, t):
        rows, intra, frac, _ = _level_geom(x, scale, nb, hashed, n_rows)
        idx_lo, t_frac = time_geom(t)
        crow = crow_lo_of(rows, intra, idx_lo)
        c = cell4.astype(cdtype)
        lo = jnp.take(c, crow, axis=0)
        hi = jnp.take(c, crow + CELLS_PER_BRICK, axis=0)
        tfc = t_frac[:, None].astype(cdtype)
        feats = lo * (1.0 - tfc) + hi * tfc
        w = (axis_w(frac, 0) * axis_w(frac, 1)) * axis_w(frac, 2)
        sel = _feature_selector(F, cdtype, CELL_CORNERS)
        out = jnp.dot(feats * w, sel, preferred_element_type=jnp.float32)
        return out.astype(cdtype), lo, hi

    @jax.custom_vjp
    def enc(cell4, x, t):
        return fwd_impl(cell4, x, t)[0]

    def fwd(cell4, x, t):
        if remat_feats:
            return fwd_impl(cell4, x, t)[0], (x, t, cell4)
        out, lo, hi = fwd_impl(cell4, x, t)
        return out, (x, t, lo, hi)

    def bwd(res, g):
        x, t, *tf = res
        rows, intra, frac, ok = _level_geom(x, scale, nb, hashed, n_rows)
        idx_lo, t_frac = time_geom(t)
        crow = crow_lo_of(rows, intra, idx_lo)
        if remat_feats:
            c = tf[0].astype(cdtype)
            lo = jnp.take(c, crow, axis=0)
            hi = jnp.take(c, crow + CELLS_PER_BRICK, axis=0)
        else:
            lo, hi = tf
        wx, wy, wz = (axis_w(frac, a) for a in range(3))
        w = (wx * wy) * wz
        gout = _expand_feat_lanes(g.astype(cdtype), F, CELL_CORNERS)
        upd = w * gout
        tfc = t_frac[:, None]
        adt = jnp.dtype(accum_dtype_name)
        total = n_rows * K * CELLS_PER_BRICK
        if scatter_impl == "xla":
            d_cell = (
                jnp.zeros((total, W), adt)
                .at[crow].add((upd * (1.0 - tfc)).astype(adt))
                .at[crow + CELLS_PER_BRICK].add((upd * tfc).astype(adt))
            )
        else:
            d_cell = _scatter_rows(
                jnp.concatenate([crow, crow + CELLS_PER_BRICK]),
                jnp.concatenate([upd * (1.0 - tfc), upd * tfc]),
                total, adt, scatter_impl)
        tfc_c = tfc.astype(cdtype)
        feats = lo * (1.0 - tfc_c) + hi * tfc_c
        h = feats * gout
        sgn = [jnp.where(bits[a] == 1, jnp.ones((), cdtype),
                         -jnp.ones((), cdtype)) for a in range(3)]
        # 3 axis sums + the keyframe-interp time grad batched as ONE
        # 4-column MXU contraction (see _axis_sum_matmul)
        sums = _axis_sum_matmul([
            h * sgn[0] * wy * wz,
            h * wx * sgn[1] * wz,
            h * wx * wy * sgn[2],
            (hi - lo) * gout * w,
        ], cdtype)
        d_frac, d_tf = sums[:, :3], sums[:, 3]
        d_x = d_frac * jnp.float32(scale) * ok
        d_t = (d_tf * jnp.float32(K - 1)).reshape(t.shape).astype(t.dtype)
        return (d_cell.astype(jnp.dtype(table_dtype_name)),
                d_x.astype(x.dtype), d_t)

    enc.defvjp(fwd, bwd)
    return enc


# --------------------------------------------------------------------- #
# Fused multi-level path: one concatenated table, one [N, L]-row gather,
# batched interpolation + backward over a level axis. The per-level path
# issues ~6 kernels per level (96 for L=16); fusing collapses that to ~10
# total, which matters because most of these ops are overhead- rather than
# bandwidth-bound at [262k, 128] sizes on v5e.
# --------------------------------------------------------------------- #


def _fused_geom(x, scales, nbs, hashed, rows_n, offsets):
    """Batched per-level geometry. x: [N,3]; static per-level metadata tuples.

    Returns (rows [N,L] i32 into the concatenated table, intra [N,L,3] i32,
    frac [N,L,3] f32, ok [N,L,3] f32 — 1 where not edge-clamped)."""
    L = len(scales)
    sc = jnp.asarray(scales, jnp.float32)            # [L]
    nb = jnp.asarray(nbs, jnp.int32)                 # [L]
    hm = jnp.asarray(hashed, bool)                   # [L]
    rn = jnp.asarray(rows_n, jnp.uint32)             # [L]
    off = jnp.asarray(offsets, jnp.int32)            # [L]

    pos = x.astype(jnp.float32)[:, None, :] * sc[None, :, None] + 0.5
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid                             # [N,L,3]
    cell_raw = pos_grid.astype(jnp.int32)
    hi = (nb * BRICK_CELLS - 1)[None, :, None]
    cell = jnp.clip(cell_raw, 0, hi)
    ok = ((cell_raw >= 0) & (cell_raw <= hi)).astype(jnp.float32)
    brick = cell // BRICK_CELLS
    intra = cell - brick * BRICK_CELLS

    b = brick.astype(jnp.uint32)
    h = (
        b[..., 0] * jnp.uint32(_PRIMES[0])
        ^ b[..., 1] * jnp.uint32(_PRIMES[1])
        ^ b[..., 2] * jnp.uint32(_PRIMES[2])
    )
    hashed_rows = (h % rn[None, :]).astype(jnp.int32)
    dense_rows = (brick[..., 0] * nb[None, :] + brick[..., 1]) * nb[None, :] \
        + brick[..., 2]
    rows = jnp.where(hm[None, :], hashed_rows, dense_rows) + off[None, :]
    return rows, intra, frac, ok


def _lane_axis_index(axis: int, n_features: int):
    """Constant [64*F] vector: per lane, its corner's index along `axis`.

    Lane layout is corner-major (corner = dx*16 + dy*4 + dz, lane =
    corner*F + f)."""
    lane = np.arange(CORNERS_PER_BRICK * n_features)
    corner = lane // n_features
    idx = (corner // (BRICK_CORNERS ** (2 - axis))) % BRICK_CORNERS
    return jnp.asarray(idx, jnp.int32)


def _axis_lane_weights(axis: int, intra_a, frac_a, dtype, n_features: int):
    """Per-axis interpolation weight and its d/dfrac, directly at full lane
    width: [N, L, 64*F] each.

    Built by comparing each lane's constant corner index against the sample's
    cell position — pure elementwise with a 128-wide minor dimension, which
    is the layout TPU tiles want. (The outer-product formulation materializes
    [N,L,4,4,4] intermediates whose tiny trailing dims pad 8-32x under XLA's
    (8,128) tiling — a compile-time OOM at real batch sizes.)
    """
    k = _lane_axis_index(axis, n_features)[None, None, :]
    ia = intra_a[..., None]                     # [N,L,1]
    fa = frac_a[..., None].astype(dtype)        # [N,L,1]
    lo = (k == ia)
    hi = (k == ia + 1)
    w = jnp.where(lo, 1.0 - fa, jnp.zeros((), dtype))
    w = jnp.where(hi, fa, w)
    dw = hi.astype(dtype) - lo.astype(dtype)
    return w, dw


@functools.lru_cache(maxsize=None)
def _make_fused_encode(scales, nbs, hashed, rows_n, offsets, total_rows: int,
                       n_feat: int, dtype_name: str,
                       table_dtype_name: str = "float32",
                       accum_dtype_name: str = "float32",
                       scatter_impl: str = "xla"):
    """Analytic custom-VJP fused encode: (flat_table [R,64F], x) -> [N, L*F].

    Single gather / single scatter-add for all levels; all interpolation
    math lives in the [N, L, 64F] lane domain (minor dim 64F = 128 for F=2)
    so every intermediate tiles cleanly.
    """
    cdtype = jnp.dtype(dtype_name)
    F = n_feat
    W = CORNERS_PER_BRICK * F
    L = len(scales)

    def geom(x):
        return _fused_geom(x, scales, nbs, hashed, rows_n, offsets)

    def lane_weights(intra, frac, with_d: bool):
        ws, dws = [], []
        for a in range(3):
            w, dw = _axis_lane_weights(a, intra[..., a], frac[..., a],
                                       cdtype, F)
            ws.append(w)
            dws.append(dw)
        return ws, (dws if with_d else None)

    def fwd_impl(table, x):
        n = x.shape[0]
        rows, intra, frac, _ = geom(x)
        (wx, wy, wz), _ = lane_weights(intra, frac, False)
        lanes = wx * wy * wz                              # [N,L,W]
        feats = jnp.take(table.astype(cdtype), rows, axis=0)  # [N,L,W]
        sel = _feature_selector(F, cdtype)
        out = jnp.dot((feats * lanes).reshape(n * L, W), sel,
                      preferred_element_type=jnp.float32)
        return out.reshape(n, L * F).astype(cdtype), feats

    @jax.custom_vjp
    def enc(table, x):
        return fwd_impl(table, x)[0]

    def fwd(table, x):
        out, feats = fwd_impl(table, x)
        return out, (x, feats)

    # constant [F, W] one-hot expanding a feature cotangent to lane width
    _expand = np.zeros((1, CORNERS_PER_BRICK, 1), np.float32) + np.eye(
        n_feat, dtype=np.float32)[:, None, :]

    def bwd(res, g):
        x, feats = res
        n = x.shape[0]
        rows, intra, frac, ok = geom(x)
        (wx, wy, wz), (dwx, dwy, dwz) = lane_weights(intra, frac, True)
        lanes = wx * wy * wz
        # gout[n,l,c*F+f] = g[n,l,f]: one skinny matmul keeps lane layout
        expand = jnp.asarray(_expand.reshape(F, W), cdtype)
        gout = jnp.dot(g.astype(cdtype).reshape(n * L, F),
                       expand).reshape(n, L, W)
        upd = lanes * gout
        adt = jnp.dtype(accum_dtype_name)
        d_table = _scatter_rows(rows.reshape(-1), upd.reshape(-1, W),
                                total_rows, adt, scatter_impl)
        h = feats * gout                                   # [N,L,W]
        d_frac = _axis_sum_matmul(
            [h * dwx * wy * wz, h * wx * dwy * wz, h * wx * wy * dwz],
            cdtype)                                         # [N,L,3]
        sc = jnp.asarray(scales, jnp.float32)
        d_x = jnp.sum(d_frac * sc[None, :, None] * ok, axis=1)
        return (d_table.astype(jnp.dtype(table_dtype_name)),
                d_x.astype(x.dtype))

    enc.defvjp(fwd, bwd)
    return enc


def brick_encode_fused(x, params, spec: BrickGridSpec,
                       compute_dtype=jnp.bfloat16):
    """Fused-all-levels brick encoding (3D specs only). See brick_encode."""
    assert not spec.time_keyframes, "fused path is 3D-only; use brick_encode"
    layouts = spec.level_layout()
    tables = []
    offsets = []
    off = 0
    for lvl, lay in enumerate(layouts):
        if lay["hashed"]:
            tables.append(params[f"bricks_{lvl}"])
        else:
            tables.append(_materialize_dense_bricks(
                params[f"grid_{lvl}"], lay["n_bricks_axis"]))
        offsets.append(off)
        off += lay["rows"]
    flat = jnp.concatenate(tables, axis=0)
    enc = _make_fused_encode(
        tuple(float(level_scale(l, spec.log_b, spec.base_res))
              for l in range(spec.n_levels)),
        tuple(lay["n_bricks_axis"] for lay in layouts),
        tuple(bool(lay["hashed"]) for lay in layouts),
        tuple(lay["rows"] for lay in layouts),
        tuple(offsets), off, spec.n_features,
        jnp.dtype(compute_dtype).name, flat.dtype.name,
        spec.grad_accum_dtype, spec.scatter_impl)
    return enc(flat, x)


@functools.lru_cache(maxsize=None)
def _make_pallas_encode(scales, nbs, hasheds, rows_n, n_feat: int,
                        dtype_name: str, table_dtype_name: str,
                        accum_dtype_name: str, remat_feats: bool = False,
                        fwd_kind: str = "gather"):
    """Analytic custom-VJP multi-level encode on the Pallas kernels.

    Forward: fwd_kind="gather" — per-level XLA row gathers feeding ONE
    all-levels interpolation kernel (pallas_encoder.interp_fwd);
    fwd_kind="dma" — the round-3 fully fused kernel
    (pallas_fused.fused_encode_fwd): in-kernel depth-pipelined row DMAs
    + interp, so the [N, 64F] gathered-row arrays never exist in HBM
    (tables are fed as f32 rows — the remote-compiler DMA envelope).
    Backward (both): one fused kernel per level (interp_bwd_fused) — lane
    math + VMEM-resident table-grad accumulator, no [N, 64F] update rows
    in HBM and no XLA scatters. Same math as the per-level XLA path
    (gated by tests/test_pallas_encoder.py, tests/test_pallas_fused.py).
    """
    from . import pallas_encoder as pe
    cdtype = jnp.dtype(dtype_name)
    F = n_feat
    L = len(scales)

    def _rows_all(x):
        return [_level_geom(x, scales[lvl], nbs[lvl], hasheds[lvl],
                            rows_n[lvl])[0] for lvl in range(L)]

    def fwd_impl(tables, x, views=None):
        rows_l = _rows_all(x)
        if fwd_kind == "dma":
            from .pallas_fused import dma128_view, fused_encode_fwd
            if views is None:
                views = [dma128_view(t) for t in tables]
            out = fused_encode_fwd(
                x, views, jnp.stack(rows_l, 0), scales, nbs, F,
                compute_dtype=cdtype, tables_are_views=True)
            return out, None, tuple(rows_l)
        feats = [jnp.take(tables[lvl].astype(cdtype), rows_l[lvl], axis=0)
                 for lvl in range(L)]
        out = pe.interp_fwd(x, feats, scales, nbs, F, compute_dtype=cdtype)
        return out, tuple(feats), tuple(rows_l)

    @jax.custom_vjp
    def enc(tables, x):
        return fwd_impl(tables, x)[0]

    def fwd(tables, x):
        if fwd_kind == "dma":
            # residuals carry the 128-lane DMA views so fwd and bwd share
            # ONE bf16-bytes table copy per level per step (the custom-vjp
            # boundary otherwise forces a second cast in the backward)
            from .pallas_fused import dma128_view
            views = [dma128_view(t) for t in tables]
            out, _, _ = fwd_impl(tables, x, views)
            return out, (x, tuple(views))
        if remat_feats:
            # keep only (x, tables): rows + gathered feats are re-derived
            # in the backward — per-sample residuals bind at 2-4M budgets
            return fwd_impl(tables, x)[0], (x, tables)
        out, feats, rows_l = fwd_impl(tables, x)
        return out, (x, feats, rows_l)

    def bwd(res, g):
        adt = jnp.dtype(accum_dtype_name)
        tdt = jnp.dtype(table_dtype_name)
        if fwd_kind == "dma":
            # in-kernel re-gather: neither feats nor update rows ever
            # exist in HBM (ops/pallas_fused.fused_encode_bwd); the
            # 128-lane table views come from the residuals (built once)
            from .pallas_fused import fused_encode_bwd
            x, views = res
            d_tables, d_x = [], jnp.zeros((), jnp.float32)
            for lvl in range(L):
                rows, _, _, _ = _level_geom(x, scales[lvl], nbs[lvl],
                                            hasheds[lvl], rows_n[lvl])
                dt, dx = fused_encode_bwd(
                    x, g[:, lvl * F:(lvl + 1) * F], rows, views[lvl],
                    scale=scales[lvl], nb=nbs[lvl], n_rows=rows_n[lvl],
                    n_feat=F, compute_dtype=cdtype, accum_dtype=adt,
                    table_is_view=True)
                d_tables.append(dt.astype(tdt))
                d_x = d_x + dx
            return tuple(d_tables), d_x.astype(x.dtype)
        if remat_feats:
            x, tables = res
            feats, rows_l = [], []
            for lvl in range(L):
                rows, _, _, _ = _level_geom(x, scales[lvl], nbs[lvl],
                                            hasheds[lvl], rows_n[lvl])
                feats.append(jnp.take(tables[lvl].astype(cdtype), rows,
                                      axis=0))
                rows_l.append(rows)
        else:
            x, feats, rows_l = res
        d_tables, d_x = [], jnp.zeros((), jnp.float32)
        for lvl in range(L):
            dt, dx = pe.interp_bwd_fused(
                x, g[:, lvl * F:(lvl + 1) * F], feats[lvl], rows_l[lvl],
                scale=scales[lvl], nb=nbs[lvl], n_rows=rows_n[lvl],
                n_feat=F, compute_dtype=cdtype, accum_dtype=adt)
            d_tables.append(dt.astype(tdt))
            d_x = d_x + dx
        return tuple(d_tables), d_x.astype(x.dtype)

    enc.defvjp(fwd, bwd)
    return enc


def _pallas_route_ok(spec: BrickGridSpec, n: int, layouts) -> bool:
    """interp_impl='pallas' preconditions: 3D, tile-divisible batch, every
    level's grad accumulator VMEM-resident."""
    if spec.time_keyframes or n % 1024 != 0:
        return False
    itemsize = jnp.dtype(spec.grad_accum_dtype).itemsize
    return all(lay["rows"] * spec.row_width * itemsize <= 12 * 2 ** 20
               for lay in layouts)


@functools.lru_cache(maxsize=None)
def _make_level_encode_4d(scale: float, nb: int, hashed: bool, n_rows: int,
                          n_feat: int, keyframes: int, dtype_name: str,
                          table_dtype_name: str = "float32",
                          accum_dtype_name: str = "float32",
                          scatter_impl: str = "xla",
                          remat_feats: bool = False):
    """Analytic custom-VJP 4D level encode: (flat [rows*K, 64F], x, t) -> [N, F].

    Keyframe-lerped brick rows (lerp(table[row,k], table[row,k+1], t_frac)
    inside the spatial interpolation — semantics of the reference's 4D Taichi
    encoder, hash_encoder_inter.py:146-199). The backward mirrors the 3D
    cmp-lane path: compare-built [N, 64F] lane weights, two scatter-adds
    (cotangent split (1-t_frac)/t_frac between the keyframe slots, matching
    hash_encoder_inter.py:202-276), the lane-dot position gradient, and —
    unlike the reference, which returns no input grads (its :423) — an
    analytic time gradient d_t = sum(w * (hi - lo) * g) * (K-1).
    """
    cdtype = jnp.dtype(dtype_name)
    F = n_feat
    W = CORNERS_PER_BRICK * F
    K = keyframes

    def geom(x):
        return _level_geom(x, scale, nb, hashed, n_rows)

    def time_geom(t):
        t_scaled = t.reshape(-1) * (K - 1)
        idx_lo = jnp.clip(jnp.floor(t_scaled), 0, K - 2).astype(jnp.int32)
        t_frac = (t_scaled - idx_lo.astype(t_scaled.dtype)).astype(jnp.float32)
        return idx_lo, t_frac

    def cmp_lanes(intra, frac, with_d: bool):
        ws, dws = [], []
        for a in range(3):
            w, dw = _lane_axis_weights_2d(a, intra[:, a], frac[:, a], cdtype,
                                          F, with_d)
            ws.append(w)
            dws.append(dw)
        return ws, dws

    def fwd_impl(flat, x, t):
        rows, intra, frac, _ = geom(x)
        idx_lo, t_frac = time_geom(t)
        (wx, wy, wz), _ = cmp_lanes(intra, frac, False)
        w_full = (wx * wy) * wz
        fl = flat.astype(cdtype)
        lo = jnp.take(fl, rows * K + idx_lo, axis=0)
        hi = jnp.take(fl, rows * K + idx_lo + 1, axis=0)
        tfc = t_frac[:, None].astype(cdtype)
        feats = lo * (1.0 - tfc) + hi * tfc
        sel = _feature_selector(F, cdtype)
        out = jnp.dot(feats * w_full, sel, preferred_element_type=jnp.float32)
        return out.astype(cdtype), lo, hi

    @jax.custom_vjp
    def enc(flat, x, t):
        return fwd_impl(flat, x, t)[0]

    def fwd(flat, x, t):
        if remat_feats:
            # re-gather lo/hi in the backward: the saved keyframe rows are
            # 2x the 3D residual footprint ([N, W] each)
            return fwd_impl(flat, x, t)[0], (x, t, flat)
        out, lo, hi = fwd_impl(flat, x, t)
        return out, (x, t, lo, hi)

    def bwd(res, g):
        x, t, *tf = res
        rows, intra, frac, ok = geom(x)
        idx_lo, t_frac = time_geom(t)
        if remat_feats:
            fl = tf[0].astype(cdtype)
            lo = jnp.take(fl, rows * K + idx_lo, axis=0)
            hi = jnp.take(fl, rows * K + idx_lo + 1, axis=0)
        else:
            lo, hi = tf
        # Full-width weights feed only the scatter updates (fused); the
        # position/time gradients run in the narrow 64-lane form (see the 3D
        # bwd_cmp): one corner-sum matmul each, then 64-wide algebra.
        (wx, wy, wz), _ = cmp_lanes(intra, frac, False)
        w_row = wx * wy * wz
        gout = _expand_feat_lanes(g.astype(cdtype), F)
        upd = w_row * gout
        tfc = t_frac[:, None]
        adt = jnp.dtype(accum_dtype_name)
        if scatter_impl == "xla":
            d_flat = (
                jnp.zeros((n_rows * K, W), adt)
                .at[rows * K + idx_lo].add((upd * (1.0 - tfc)).astype(adt))
                .at[rows * K + idx_lo + 1].add((upd * tfc).astype(adt))
            )
        else:
            # one combined scatter: both keyframe slots in a single [2N]
            # row stream (per-op fixed cost paid once)
            d_flat = _scatter_rows(
                jnp.concatenate([rows * K + idx_lo, rows * K + idx_lo + 1]),
                jnp.concatenate([upd * (1.0 - tfc), upd * tfc]),
                n_rows * K, adt, scatter_impl)
        feats = lo * (1.0 - tfc.astype(cdtype)) + hi * tfc.astype(cdtype)
        sum_sel = _corner_sum_selector(F, cdtype)
        h64 = jnp.dot(feats * gout, sum_sel,
                      preferred_element_type=jnp.float32).astype(cdtype)
        t64 = jnp.dot((hi - lo) * gout, sum_sel,
                      preferred_element_type=jnp.float32).astype(cdtype)
        ws64, dws64 = [], []
        for a in range(3):
            w1, dw1 = _lane_axis_weights_2d(a, intra[:, a], frac[:, a],
                                            cdtype, 1, True)
            ws64.append(w1)
            dws64.append(dw1)
        w64_row = ws64[0] * ws64[1] * ws64[2]
        # 3 axis sums + the keyframe time grad as ONE 4-column contraction
        sums = _axis_sum_matmul(
            [h64 * dws64[0] * ws64[1] * ws64[2],
             h64 * ws64[0] * dws64[1] * ws64[2],
             h64 * ws64[0] * ws64[1] * dws64[2],
             t64 * w64_row], cdtype)
        d_frac, d_tf = sums[:, :3], sums[:, 3]
        d_x = d_frac * jnp.float32(scale) * ok
        d_t = (d_tf * jnp.float32(K - 1)).reshape(t.shape).astype(t.dtype)
        return (d_flat.astype(jnp.dtype(table_dtype_name)),
                d_x.astype(x.dtype), d_t)

    enc.defvjp(fwd, bwd)
    return enc


def brick_encode(x, params, spec: BrickGridSpec, t: Optional[jnp.ndarray] = None,
                 compute_dtype=jnp.bfloat16, use_custom_vjp: bool = True,
                 dx_impl: str = "hybrid"):
    """Multiresolution brick-grid encoding.

    Args:
      x: [N, 3] unit-cube positions; t: [N, 1] times (4D specs only).
      params: dict from BrickGridSpec.init_params.
      use_custom_vjp: route 3D levels through the analytic-backward level
        encode (compile-time/runtime win); False keeps pure autodiff
        (reference path for gradient tests).
    Returns [N, n_levels * n_features] in compute_dtype.
    """
    n = x.shape[0]
    f = spec.n_features
    k = spec.keyframes
    layouts = spec.level_layout()

    if spec.interp_impl == "dma":
        from .pallas_fused import DMA_LANES, dma_tile
        # grid <= the k9 crash bound AND F=4 (32F must equal the 128-lane
        # DMA row width the remote Mosaic build accepts — bisect k18) AND
        # bf16 compute: dma128_view moves bf16-valued bytes, so with
        # compute_dtype=float32 it would silently quantize f32 tables and
        # diverge from the f32 gather path (ADVICE r3 #2)
        dma_ok = (dma_tile(n, 512) is not None
                  and 32 * spec.n_features == DMA_LANES
                  and jnp.dtype(compute_dtype) == jnp.bfloat16)
    else:
        dma_ok = True
    if (use_custom_vjp and spec.interp_impl in ("pallas", "dma")
            and spec.row_layout == "brick"
            and _pallas_route_ok(spec, n, layouts) and dma_ok):
        tables = tuple(
            params[f"bricks_{lvl}"] if lay["hashed"]
            else _materialize_dense_bricks(params[f"grid_{lvl}"],
                                           lay["n_bricks_axis"])
            for lvl, lay in enumerate(layouts))
        enc = _make_pallas_encode(
            tuple(float(level_scale(l, spec.log_b, spec.base_res))
                  for l in range(spec.n_levels)),
            tuple(lay["n_bricks_axis"] for lay in layouts),
            tuple(bool(lay["hashed"]) for lay in layouts),
            tuple(lay["rows"] for lay in layouts), f,
            jnp.dtype(compute_dtype).name, tables[0].dtype.name,
            spec.grad_accum_dtype, spec.remat_feats,
            fwd_kind="dma" if spec.interp_impl == "dma" else "gather")
        return enc(tables, x)

    if spec.time_keyframes:
        t_scaled = t.reshape(n) * (k - 1)
        idx_lo = jnp.clip(jnp.floor(t_scaled), 0, k - 2).astype(jnp.int32)
        t_frac = (t_scaled - idx_lo.astype(t_scaled.dtype)).astype(jnp.float32)

    # Level-fused cell path (3D): ONE gather + ONE table-grad scatter for
    # all hashed levels (their [rows*27, 8F] cell tables concatenated).
    # Dense levels keep their per-level paths (brick rows + the tiny-table
    # one-hot MXU gradient, which the big row scatter would regress).
    fused_slices = {}
    if (not spec.time_keyframes and use_custom_vjp
            and spec.row_layout == "cellfused"):
        h_lvls = [lvl for lvl, lay in enumerate(layouts)
                  if lay["hashed"]
                  and lay["rows"] * CELLS_PER_BRICK <= spec.cell_rows_cap]
        if h_lvls:
            cells, offsets = [], []
            off = 0
            for lvl in h_lvls:
                cells.append(_expand_cell_table(
                    params[f"bricks_{lvl}"].astype(compute_dtype), f))
                offsets.append(off)
                off += layouts[lvl]["rows"] * CELLS_PER_BRICK
            flat_cell = cells[0] if len(cells) == 1 \
                else jnp.concatenate(cells, axis=0)
            enc = _make_cell_fused_encode(
                tuple(float(level_scale(l, spec.log_b, spec.base_res))
                      for l in h_lvls),
                tuple(layouts[l]["n_bricks_axis"] for l in h_lvls),
                tuple(True for _ in h_lvls),
                tuple(layouts[l]["rows"] for l in h_lvls),
                tuple(offsets), off, f, jnp.dtype(compute_dtype).name,
                flat_cell.dtype.name, spec.grad_accum_dtype,
                spec.scatter_impl, spec.remat_feats)
            fused_out = enc(flat_cell, x)          # [N, len(h_lvls)*F]
            for i, lvl in enumerate(h_lvls):
                fused_slices[lvl] = fused_out[:, i * f:(i + 1) * f]

    sel = _feature_selector(f, compute_dtype)
    outs = []
    for lvl, lay in enumerate(layouts):
        scale = level_scale(lvl, spec.log_b, spec.base_res)
        if not spec.time_keyframes:
            if lvl in fused_slices:
                outs.append(fused_slices[lvl])
                continue
            zp = ZROWS_PER_BRICK if spec.row_layout == "cellz" \
                else CELLS_PER_BRICK
            if (lay["hashed"] and use_custom_vjp
                    and spec.row_layout in ("cell", "cellz")
                    and lay["rows"] * zp <= spec.cell_rows_cap):
                # expand in compute dtype: the gathered rows are cast there
                # anyway, and a bf16 expansion matmul runs at full MXU rate
                # (the fold back to the f32 master runs through astype's
                # autodiff, accumulating in f32)
                zpack = spec.row_layout == "cellz"
                expand = _expand_cellz_table if zpack else _expand_cell_table
                make = (_make_level_encode_cellz if zpack
                        else _make_level_encode_cell)
                cell = expand(
                    params[f"bricks_{lvl}"].astype(compute_dtype), f)
                enc = make(
                    float(scale), lay["n_bricks_axis"], True, lay["rows"],
                    f, jnp.dtype(compute_dtype).name, cell.dtype.name,
                    spec.grad_accum_dtype, spec.scatter_impl,
                    spec.remat_feats)
                outs.append(enc(cell, x))
                continue
            if lay["hashed"]:
                table = params[f"bricks_{lvl}"]
            else:
                table = _materialize_dense_bricks(
                    params[f"grid_{lvl}"], lay["n_bricks_axis"]
                )
            if use_custom_vjp:
                enc = _make_level_encode(
                    float(scale), lay["n_bricks_axis"], lay["hashed"],
                    lay["rows"], f, jnp.dtype(compute_dtype).name,
                    table.dtype.name, dx_impl, spec.grad_accum_dtype,
                    spec.scatter_impl, spec.remat_feats)
                outs.append(enc(table, x))
            else:
                rows, w = _level_rows_and_weights(
                    x, lvl, lay, spec, full_width=True,
                    weight_dtype=compute_dtype)
                feats = jnp.take(table.astype(compute_dtype), rows, axis=0)
                # interpolation as elementwise weight multiply + one skinny
                # MXU matmul — no [N, 64F] fp32 intermediates hit HBM
                out = jnp.dot(
                    feats * w.astype(compute_dtype), sel,
                    preferred_element_type=jnp.float32,
                )
                outs.append(out.astype(compute_dtype))
            continue
        if lay["hashed"]:
            # stored keyframe-major: [rows, K, 64, F]
            table = params[f"bricks_{lvl}"]
        else:
            table = _materialize_dense_bricks(
                params[f"grid_{lvl}"], lay["n_bricks_axis"]
            )  # [rows, 64, K*F] corner-major
            nb3 = table.shape[0]
            table = (
                table.reshape(nb3, CORNERS_PER_BRICK, k, f)
                .transpose(0, 2, 1, 3)
                .reshape(nb3, k * spec.row_width)
            )
        flat = table.reshape(-1, spec.row_width)  # [(rows*K), 64F]
        if (use_custom_vjp and spec.row_layout in ("cell", "cellfused",
                                                   "cellz")
                and lay["rows"] * k * CELLS_PER_BRICK <= spec.cell_rows_cap):
            # no cross-level fusion for keyframe levels (two gathers/sample
            # with per-sample keyframe offsets); cellfused/cellz == cell here
            cell4 = _expand_cell_table(flat.astype(compute_dtype), f)
            enc = _make_level_encode_cell_4d(
                float(scale), lay["n_bricks_axis"], lay["hashed"],
                lay["rows"], f, k, jnp.dtype(compute_dtype).name,
                cell4.dtype.name, spec.grad_accum_dtype, spec.scatter_impl,
                spec.remat_feats)
            outs.append(enc(cell4, x, t))
            continue
        if use_custom_vjp:
            enc = _make_level_encode_4d(
                float(scale), lay["n_bricks_axis"], lay["hashed"],
                lay["rows"], f, k, jnp.dtype(compute_dtype).name,
                flat.dtype.name, spec.grad_accum_dtype, spec.scatter_impl,
                spec.remat_feats)
            outs.append(enc(flat, x, t))
            continue
        rows, w = _level_rows_and_weights(x, lvl, lay, spec, full_width=True,
                                          weight_dtype=compute_dtype)
        # gather only the two relevant keyframe slices (512B rows each)
        lo = jnp.take(flat.astype(compute_dtype), rows * k + idx_lo, axis=0)
        hi = jnp.take(flat.astype(compute_dtype), rows * k + idx_lo + 1, axis=0)
        tfc = t_frac[:, None].astype(compute_dtype)
        feats = lo * (1.0 - tfc) + hi * tfc
        out = jnp.dot(
            feats * w.astype(compute_dtype), sel,
            preferred_element_type=jnp.float32,
        )
        outs.append(out.astype(compute_dtype))
    return jnp.concatenate(outs, axis=-1)
