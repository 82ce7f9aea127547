"""Pallas lane-math kernels for the brick-grid encoder hot path.

Round-1 profiling (tools/profile_trace.py on v5e) showed the brick encoder's
cost is NOT the row movement itself — XLA's gather (~0.8 ms / 262k rows) and
scatter-add (~2.6-4.3 ms) are the best row primitives on this chip (Pallas
per-row loops measured 4-5x slower; v5e has no SparseCore) — but the lane
*math* around them: XLA materializes each backward's [N, 256] trilinear
weight/derivative passes plus fp32 converts as ~6 separate HBM round trips
per level (~2.7 ms/level math + 0.8 ms residual copies, x8 levels).

These kernels keep the row gathers in XLA and fuse everything else:

  * `interp_fwd(feats, x)`    — gathered brick rows -> interpolated [N, F]
                                features for all levels in ONE kernel pass
                                (lane weights compare-built in-register,
                                log-depth corner reduction).
  * `interp_bwd(feats, x, g)` — recomputes the lane weights, emits the
                                scatter-ready table update rows `upd` and the
                                input-position gradient d_x in one pass; the
                                caller scatters `upd` with XLA `.at[].add`.
  * `interp_bwd_fused(...)`   — single-LEVEL backward that also owns the
                                table-grad accumulation: lane math + a
                                VMEM-resident accumulator in one kernel, so
                                the [N, 64F] update rows never touch HBM
                                (wired as BrickGridSpec.scatter_impl="fused").

The multi-level kernels collapse the interpolation fwd/bwd to 2 launches
instead of ~50 XLA ops; the fused backward further removes the per-level
XLA scatter (~2.7-4.4 ms each on v5e) and its upd materialization.

All lane weights are compare-built at full row width ([T, 64F]) from a 2D
iota — an earlier pltpu.repeat-based narrow->wide expansion was WRONG for
n_features > 1 (tpu.repeat tiles whole blocks rather than repeating
elements; caught by tests/test_pallas_encoder.py before any production
wiring).

Reference semantics: trilinear NGP interpolation + its two backward products
(hash_encoder_half.py:137-227); storage layout and lane conventions are
ops/brick_grid.py's (corner-major rows, corner = dx*16 + dy*4 + dz,
lane = corner*F + f).
"""

import functools
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cednerf_tpu.ops.pallas_scatter import accum_rows_aligned

BRICK_CELLS = 3
BRICK_CORNERS = 4
CORNERS_PER_BRICK = 64


def _lane_axis_index(axis: int, n_features: int, tile: int):
    """Per-lane corner index along `axis` (ops/brick_grid.py lane layout).

    Built in-kernel at full [tile, W] shape from a 2D iota (Pallas kernels
    cannot capture host constants, and Mosaic lowers full-shape compares more
    reliably than [1, W] vs [T, 1] double broadcasts)."""
    w = CORNERS_PER_BRICK * n_features
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile, w), 1)
    corner = lane // n_features
    return (corner // (BRICK_CORNERS ** (2 - axis))) % BRICK_CORNERS


def _reduce_corners(prod, n_features: int):
    """[T, 64F] -> [T, F]: sum each feature's 64 corner lanes.

    Corner-major lanes mean halving the lane axis adds corner c with c+32
    (same f); six halvings land on the F feature lanes — log-depth adds
    instead of a skinny one-hot MXU matmul."""
    w = prod.shape[-1]
    while w > n_features:
        half = w // 2
        prod = prod[:, :half] + prod[:, half:]
        w = half
    return prod


def _expand_mat_np(n_features: int) -> np.ndarray:
    """[F, 64F] one-hot: expands a feature cotangent to lane width."""
    w = CORNERS_PER_BRICK * n_features
    m = np.zeros((n_features, w), np.float32)
    m[np.arange(w) % n_features, np.arange(w)] = 1.0
    return m


def _axis_geom(x_col, scale, nb):
    """Per-axis cell geometry: (intra [T,1] i32, frac [T,1] f32, ok [T,1])."""
    pos = x_col * scale + 0.5
    pos_grid = jnp.floor(pos)
    frac = pos - pos_grid
    cell_raw = pos_grid.astype(jnp.int32)
    hi = nb * BRICK_CELLS - 1
    cell = jnp.clip(cell_raw, 0, hi)
    ok = ((cell_raw >= 0) & (cell_raw <= hi)).astype(jnp.float32)
    intra = cell - (cell // BRICK_CELLS) * BRICK_CELLS
    return intra, frac, ok


def _lane_weights(x_ref, scale, nb, lane_idx, cdtype, with_d: bool):
    """Compare-built per-axis lane weights (and d/dfrac) for one level.

    Returns ([wx, wy, wz], [dwx, dwy, dwz] or None, ok [T, 3]).
    Everything lives in registers/VMEM at [T, 64F] width.
    """
    ws, dws, oks = [], [], []
    for a in range(3):
        intra, frac, ok = _axis_geom(x_ref[:, a:a + 1], scale, nb)
        k = lane_idx[a]
        # arithmetic select: Mosaic crashes on bf16 `where` with implicit
        # [T,1] -> [T,W] broadcast (v5e, 2026-08); mask-multiply lowers fine
        lo = (k == intra).astype(cdtype)
        hi = (k == (intra + 1)).astype(cdtype)
        f = frac.astype(cdtype)
        ws.append(lo * (1.0 - f) + hi * f)
        if with_d:
            dws.append(hi - lo)
        oks.append(ok)
    return ws, (dws if with_d else None), jnp.concatenate(oks, axis=-1)


def _default_interpret(interpret):
    """Compile on TPU; interpret elsewhere (the CPU test mesh)."""
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


@functools.lru_cache(maxsize=None)
def _build_fwd(scales: Tuple[float, ...], nbs: Tuple[int, ...], n_feat: int,
               n: int, tile: int, dtype_name: str, interpret: bool = False):
    """interp forward kernel: L x [T, 64F] gathered rows -> [T, L*F]."""
    L = len(scales)
    F = n_feat
    W = CORNERS_PER_BRICK * F
    cdtype = jnp.dtype(dtype_name)

    def kernel(x_ref, *refs):
        feat_refs = refs[:L]
        out_ref = refs[L]
        lane_idx = [_lane_axis_index(a, F, tile) for a in range(3)]
        for lvl in range(L):
            ws, _, _ = _lane_weights(x_ref[...], scales[lvl], nbs[lvl],
                                     lane_idx, cdtype, False)
            lanes = ws[0] * ws[1] * ws[2]
            prod = feat_refs[lvl][...].astype(cdtype) * lanes
            out = _reduce_corners(prod.astype(jnp.float32), F)
            out_ref[:, lvl * F:(lvl + 1) * F] = out.astype(out_ref.dtype)

    grid = (n // tile,)
    in_specs = [
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((tile, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(L)
    ]
    out_specs = pl.BlockSpec((tile, L * F), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)

    def run(x, feats_list):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=jax.ShapeDtypeStruct((n, L * F), cdtype),
            interpret=interpret,
        )(x, *feats_list)

    return run


@functools.lru_cache(maxsize=None)
def _build_bwd(scales: Tuple[float, ...], nbs: Tuple[int, ...], n_feat: int,
               n: int, tile: int, dtype_name: str, upd_dtype_name: str,
               interpret: bool = False):
    """interp backward kernel.

    (x [T,3], g [T, L*F], L x feats [T, W]) ->
    (L x upd [T, W] scatter rows, d_x [T, 3]).
    """
    L = len(scales)
    F = n_feat
    W = CORNERS_PER_BRICK * F
    cdtype = jnp.dtype(dtype_name)
    upd_dtype = jnp.dtype(upd_dtype_name)

    def kernel(x_ref, g_ref, *refs):
        feat_refs = refs[:L]
        upd_refs = refs[L:2 * L]
        dx_ref = refs[2 * L]
        lane_idx = [_lane_axis_index(a, F, tile) for a in range(3)]
        d_cols = []
        for lvl in range(L):
            ws, dws, oks = _lane_weights(x_ref[...], scales[lvl], nbs[lvl],
                                         lane_idx, cdtype, True)
            # gout[t, lane] = g[t, lvl*F + lane%F]: one tile-by-concat of the
            # [T, F] cotangent block (a [T,F]@[F,W] dot has contraction dim
            # 4, which the MXU wastes; masked builds cost ~3F full passes)
            g_lvl = g_ref[:, lvl * F:(lvl + 1) * F].astype(cdtype)
            # tile-repeat IS the wanted expansion: gout[t, c*F+f] = g[t, f]
            gout = pltpu.repeat(g_lvl, CORNERS_PER_BRICK, axis=1)
            wyz = ws[1] * ws[2]
            lanes = ws[0] * wyz
            upd_refs[lvl][...] = (lanes * gout).astype(upd_dtype)
            h = feat_refs[lvl][...].astype(cdtype) * gout
            sc = jnp.float32(scales[lvl])
            d0 = jnp.sum((h * (dws[0] * wyz)).astype(jnp.float32),
                         axis=-1, keepdims=True) * oks[:, 0:1] * sc
            d1 = jnp.sum((h * (ws[0] * dws[1] * ws[2])).astype(jnp.float32),
                         axis=-1, keepdims=True) * oks[:, 1:2] * sc
            d2 = jnp.sum((h * (ws[0] * ws[1] * dws[2])).astype(jnp.float32),
                         axis=-1, keepdims=True) * oks[:, 2:3] * sc
            d_cols.append((d0, d1, d2))
        for a in range(3):
            acc = d_cols[0][a]
            for lvl in range(1, L):
                acc = acc + d_cols[lvl][a]
            dx_ref[:, a:a + 1] = acc

    grid = (n // tile,)
    in_specs = [
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, L * F), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ] + [
        pl.BlockSpec((tile, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(L)
    ]
    out_specs = tuple(
        pl.BlockSpec((tile, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(L)
    ) + (pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),)
    out_shape = tuple(
        jax.ShapeDtypeStruct((n, W), upd_dtype) for _ in range(L)
    ) + (jax.ShapeDtypeStruct((n, 3), jnp.float32),)

    def run(x, g, feats_list):
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(x, g, *feats_list)
        return list(outs[:L]), outs[L]

    return run


def interp_fwd(x, feats_list: Sequence[jnp.ndarray],
               scales: Sequence[float], nbs: Sequence[int], n_feat: int,
               compute_dtype=jnp.bfloat16, tile: int = 512, interpret=None):
    """All-level trilinear interpolation of gathered brick rows.

    x: [N, 3] unit-cube positions; feats_list: per-level gathered rows
    [N, 64F]. Returns [N, L*F] in compute_dtype.
    """
    n = x.shape[0]
    assert n % tile == 0, (n, tile)
    run = _build_fwd(tuple(float(s) for s in scales), tuple(nbs), n_feat, n,
                     tile, jnp.dtype(compute_dtype).name,
                     _default_interpret(interpret))
    return run(x.astype(jnp.float32), list(feats_list))


def interp_bwd(x, g, feats_list: Sequence[jnp.ndarray],
               scales: Sequence[float], nbs: Sequence[int], n_feat: int,
               compute_dtype=jnp.bfloat16, upd_dtype=jnp.float32,
               tile: int = 256, interpret=None):
    # tile=256: at L=8/F=4 the live set (8 bf16 feat blocks + 8 f32 upd
    # blocks, double-buffered) exceeds v5e VMEM at tile=512 (Mosaic OOM)
    """Backward of `interp_fwd`: per-level scatter rows + position gradient.

    g: [N, L*F] cotangent. Returns (upd_list: L x [N, 64F] upd_dtype rows to
    scatter-add at each level's gather indices, d_x [N, 3] f32).
    """
    n = x.shape[0]
    assert n % tile == 0, (n, tile)
    run = _build_bwd(tuple(float(s) for s in scales), tuple(nbs), n_feat, n,
                     tile, jnp.dtype(compute_dtype).name,
                     jnp.dtype(upd_dtype).name, _default_interpret(interpret))
    return run(x.astype(jnp.float32), g, list(feats_list))


# --------------------------------------------------------------------- #
# Fully fused single-level backward: lane math + VMEM-resident table-grad
# accumulator in ONE kernel. Replaces (per level) the XLA lane-math passes
# + [N, 64F] upd materialization + XLA scatter-add with a single pass that
# never writes the update rows to HBM: the accumulator lives in VMEM
# scratch across a sequential sample-tile grid (pallas_scatter.py's
# pattern) and the scatter rows are produced and consumed in-register.
# This is the TPU-native analogue of the reference Taichi backward's fused
# weight-recompute + atomic table accumulation (hash_encoder_half.py:
# 164-227); collisions are free because the grid is sequential per core.
# --------------------------------------------------------------------- #


@functools.lru_cache(maxsize=None)
def _build_bwd_fused(scale: float, nb: int, n_rows: int, n_feat: int,
                     n: int, tile: int, unroll: int, dtype_name: str,
                     accum_dtype_name: str, interpret: bool = False):
    """(x [T,3], g [T,F], feats [T,W], rows [T]) -> (d_table, d_x)."""
    F = n_feat
    W = CORNERS_PER_BRICK * F
    cdtype = jnp.dtype(dtype_name)
    adt = jnp.dtype(accum_dtype_name)
    # pad the accumulator to the aligned-window granule (dense levels have
    # e.g. 17^3 = 4913 rows); padding rows are never indexed, sliced away
    n_rows_pad = -(-n_rows // 8) * 8

    def kernel(rows_ref, x_ref, g_ref, feat_ref, out_ref, dx_ref,
               upd_ref):
        # out_ref doubles as the VMEM-resident accumulator (constant index
        # map); a separate scratch would OOM the 16 MB VMEM budget
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        lane_idx = [_lane_axis_index(a, F, tile) for a in range(3)]
        ws, dws, oks = _lane_weights(x_ref[...], scale, nb, lane_idx,
                                     cdtype, True)
        # gout[t, c*F + f] = g[t, f]
        g_t = g_ref[...].astype(cdtype)
        # tile-repeat IS the wanted expansion: gout[t, c*F+f] = g[t, f]
        gout = pltpu.repeat(g_t, CORNERS_PER_BRICK, axis=1)
        wyz = ws[1] * ws[2]
        lanes = ws[0] * wyz
        upd_ref[...] = (lanes * gout).astype(adt)

        h = feat_ref[...].astype(cdtype) * gout
        sc = jnp.float32(scale)
        d0 = jnp.sum((h * (dws[0] * wyz)).astype(jnp.float32),
                     axis=-1, keepdims=True) * oks[:, 0:1] * sc
        d1 = jnp.sum((h * (ws[0] * dws[1] * ws[2])).astype(jnp.float32),
                     axis=-1, keepdims=True) * oks[:, 1:2] * sc
        d2 = jnp.sum((h * (ws[0] * ws[1] * dws[2])).astype(jnp.float32),
                     axis=-1, keepdims=True) * oks[:, 2:3] * sc
        dx_ref[...] = jnp.concatenate([d0, d1, d2], axis=1)

        # aligned-window accumulate (arbitrary dynamic row offsets do not
        # lower on Mosaic — see pallas_scatter.ALIGN)
        accum_rows_aligned(out_ref, rows_ref, upd_ref, tile)

    grid = (n // tile,)

    def run(rows, x, g, feats):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                # group-major 2-D rows: a (tile,) 1-D block below XLA's
                # 1024-element layout granule fails Mosaic operand-layout
                # verification (see pallas_scatter.accum_rows_aligned)
                pl.BlockSpec((tile // 8, 8), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, F), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((n_rows_pad, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_rows_pad, W), adt),
                jax.ShapeDtypeStruct((n, 3), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((tile, W), adt),
            ],
            interpret=interpret,
        )(rows.astype(jnp.int32).reshape(n // 8, 8), x, g, feats)

    def run_sliced(rows, x, g, feats):
        d_table, d_x = run(rows, x, g, feats)
        return d_table[:n_rows], d_x

    return run_sliced


def interp_bwd_fused(x, g, feats, rows, *, scale: float, nb: int,
                     n_rows: int, n_feat: int,
                     compute_dtype=jnp.bfloat16, accum_dtype=jnp.float32,
                     tile: int = 256, unroll: int = 8, interpret=None):
    # tile=256: the [tile, W] lane-weight intermediates + the 8 MB
    # 16384-row accumulator block must fit the 16 MB scoped-VMEM budget;
    # tile=1024 measured 19.7 MB, tile=512 still 16.48 MB in-program
    """Single-level fused encoder backward.

    x: [N,3] unit-cube positions; g: [N,F] cotangent; feats: [N,64F]
    gathered brick rows (forward residuals); rows: [N] gather indices.
    Returns (d_table [n_rows, 64F] in accum_dtype, d_x [N,3] f32 —
    already scaled and edge-gated).
    """
    n = x.shape[0]
    assert n % tile == 0, (n, tile)
    run = _build_bwd_fused(float(scale), int(nb), int(n_rows), n_feat, n,
                           tile, unroll, jnp.dtype(compute_dtype).name,
                           jnp.dtype(accum_dtype).name,
                           _default_interpret(interpret))
    return run(rows, x.astype(jnp.float32),
               g.astype(jnp.dtype(compute_dtype)), feats)
