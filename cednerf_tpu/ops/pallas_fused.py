"""Round-3 fused encoder: per-row DMA gather + all-levels interp (dma128).

The 2026-08-19/20 measurement campaign (docs/PERF_PLAN.md) established:

  * the encoder is ~75% of the train step and every XLA-level layout /
    row-width / fusion arrangement is exhausted (sessions 6-13);
  * a Pallas kernel only pays on v5e when ONE boundary replaces many ops
    (per-level kernels measured as in-program losses: the pallas_call
    boundary forces [N, 64F] intermediates through HBM that XLA would
    have fused away);
  * the tunnel's remote Mosaic compiler accepts per-row DMA only inside
    a narrow envelope — f32 rows at EXACTLY 128 lanes, modest grids
    (bisect k4/k5/k8/k12-k14 PASS; bf16 rows k7, 32-lane rows k10,
    256-lane rows k18, 4096-program grids k9 all CRASH it).

Session-19 bisect verdict (k18): the first fused build DMA'd f32 rows at
64F = 256 lanes — outside the envelope; k15/k16/k17 crashed on exactly
that. This rewrite is the **dma128** scheme that stays inside it:

  * brick tables are stored/DMA'd as their bit-identical f32[R, 32F]
    bitcast view (a bf16[R, 64F] row IS an f32[R, 128] row at F=4);
  * in-kernel `pltpu.bitcast` unpacks the DMA'd f32[tile, 128] scratch to
    bf16[2*tile, 128] along SUBLANES: row 2j holds canonical lanes
    {0,2,4,...} of sample j, row 2j+1 lanes {1,3,...}. With canonical
    lane k = corner*F + feat and F = 4, that interleaved layout is
    EXACTLY the F'=2 corner-major lane layout at double the rows:
    corner = lane' // 2, feat = 2*(lane' % 2) + row-parity. The existing
    compare-built lane machinery (pallas_encoder._lane_axis_index /
    _lane_weights / _reduce_corners with n_features=2) therefore applies
    unchanged — only the sample axis is pre-expanded (x repeated 2x).

One pallas_call runs the whole multi-resolution forward: L per-sample row
DMAs (depth-pipelined, HBM -> VMEM scratch) + interp lane math per level;
the [N, 64F] gathered-row arrays never exist in HBM. The backward re-
gathers rows with the same DMA, builds the canonical [tile, 64F] update
rows in-register, and accumulates the table gradient in a VMEM-resident
output block (no XLA scatters, no HBM update rows).

Reference role: tiny-cuda-nn's fully-fused HashGrid encoding
(model.py:242-252; math spec hash_encoder_half.py:66-160).

Constraints: n_feat == 4 (32F must equal the 128-lane DMA width),
3D specs, brick row layout, grids <= MAX_PROGRAMS.
"""

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cednerf_tpu.ops.pallas_encoder import (
    _default_interpret,
    _lane_axis_index,
    _lane_weights,
    _reduce_corners,
)

CORNERS_PER_BRICK = 64
DMA_LANES = 128  # the only row width the remote Mosaic build accepts

# The tunnel's remote Mosaic compiler deterministically crashes on grids
# past this size (bisect k9: 4096 programs CRASH, k12-k14: <=2048 PASS).
MAX_PROGRAMS = 2048


def dma_tile(n: int, base: int, max_programs: int = MAX_PROGRAMS):
    """Smallest power-of-two multiple of `base` dividing n with
    n/tile <= max_programs, or None if no such tile exists.

    Keeps every fused-DMA pallas_call inside the measured remote-compile
    envelope at any sample budget (the 2^20 bench budget at tile=256
    would otherwise build the exact 4096-program grid bisect k9 records
    as a deterministic crash)."""
    tile = base
    while n % tile == 0 and n // tile > max_programs:
        tile *= 2
    if n % tile != 0 or n // tile > max_programs:
        return None
    return tile


def dma128_view(table) -> jnp.ndarray:
    """[R, 64F] table (any float dtype) -> its f32[R, 32F] DMA view.

    bf16 is the compute/parity dtype (the XLA gather path also computes at
    bf16); the f32 bitcast view is bit-identical bytes, shaped to the
    128-lane row the remote compiler accepts (bisect k11/k23).

    The view carries bf16-VALUED bytes: an f32 table is quantized to bf16
    first, so this path only matches the XLA gather path when the compute
    dtype is bf16 — callers must gate on that (brick_grid dispatch does;
    ADVICE r3 #2)."""
    t16 = table.astype(jnp.bfloat16)
    r, w = t16.shape
    return jax.lax.bitcast_convert_type(
        t16.reshape(r, w // 2, 2), jnp.float32)


def _unpack_interleaved(out2, n, levels, n_feat):
    """[2N, 2L] per-parity/per-q sums -> canonical [N, L*F] features.

    Column 2l+q of row 2j+p is feature f = 2q+p of level l, sample j."""
    return (out2.reshape(n, 2, levels, 2)
            .transpose(0, 2, 3, 1)
            .reshape(n, levels * n_feat))


def _pipelined_row_dma(read_row, table_ref, scr, sems, depth, tile):
    """depth-pipelined per-row DMA: table[read_row(j)] -> scr[j]."""
    def copy(j):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(read_row(j), 1), :],
            scr.at[pl.ds(j, 1), :],
            sems.at[j % depth],
        )

    def body(j, c):
        @pl.when(j >= depth)
        def _():
            copy(j - depth).wait()

        copy(j).start()
        return c

    jax.lax.fori_loop(0, tile, body, 0)

    def tail(j, c):
        copy(tile - depth + j).wait()
        return c

    jax.lax.fori_loop(0, depth, tail, 0)


@functools.lru_cache(maxsize=None)
def _build_fused_fwd(scales: Tuple[float, ...], nbs: Tuple[int, ...],
                     n_feat: int, n: int, tile: int, depth: int,
                     dtype_name: str, out_dtype_name: str,
                     interpret: bool = False):
    """(rows [L, N] i32, x2 [2N, 3] f32, L x view f32[R_l, 128])
    -> [2N, 2L] interleaved feature sums."""
    L = len(scales)
    F = n_feat
    assert 32 * F == DMA_LANES, (F, "dma128 requires n_feat == 4")
    cdtype = jnp.dtype(dtype_name)
    out_dtype = jnp.dtype(out_dtype_name)

    def kernel(rows_ref, x2_ref, *refs):
        views = refs[:L]
        out_ref = refs[L]
        scr = refs[L + 1]
        sems = refs[L + 2]

        # interleaved bitcast layout == the F'=2 corner-major lane layout
        # at 2x rows (module docstring)
        lane_idx = [_lane_axis_index(a, 2, 2 * tile) for a in range(3)]
        for lvl in range(L):
            _pipelined_row_dma(lambda j, lvl=lvl: rows_ref[lvl, j],
                               views[lvl], scr, sems, depth, tile)
            vals16 = pltpu.bitcast(scr[...], jnp.bfloat16)  # [2T, 128]
            ws, _, _ = _lane_weights(x2_ref[...], scales[lvl], nbs[lvl],
                                     lane_idx, cdtype, False)
            prod = vals16.astype(cdtype) * (ws[0] * ws[1] * ws[2])
            out = _reduce_corners(prod.astype(jnp.float32), 2)  # [2T, 2]
            out_ref[:, 2 * lvl:2 * lvl + 2] = out.astype(out_ref.dtype)

    grid = (n // tile,)
    in_specs = [
        # row indices as an SMEM block (DMA source offsets must be scalars;
        # scalar-prefetching [L, N] would not fit SMEM at the bench N)
        pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.SMEM),
        pl.BlockSpec((2 * tile, 3), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.ANY) for _ in range(L)]
    out_specs = pl.BlockSpec((2 * tile, 2 * L), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)

    def run(rows, x2, views):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=jax.ShapeDtypeStruct((2 * n, 2 * L), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((tile, DMA_LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((depth,)),
            ],
            interpret=interpret,
        )(rows, x2, *views)

    return run


def fused_encode_fwd(x, tables: Sequence[jnp.ndarray], rows,
                     scales: Sequence[float], nbs: Sequence[int],
                     n_feat: int, compute_dtype=jnp.bfloat16,
                     out_dtype=None, tile: int = 512, depth: int = 8,
                     interpret=None, tables_are_views: bool = False):
    """All-levels brick encode with in-kernel row gather (dma128 scheme).

    x: [N, 3] unit-cube positions; tables: L x [R_l, 64F] brick tables
    (any float dtype — converted to the bf16-bytes f32[R, 128] DMA view
    internally unless tables_are_views); rows: [L, N] int32 per-level
    brick row indices (brick_grid._level_geom math, computed in XLA where
    1-D ops are ~free). Returns [N, L*F] features, bit-matching the
    bf16 gather+interp_fwd path. n_feat must be 4.
    """
    n = x.shape[0]
    tile = dma_tile(n, tile) or tile
    assert n % tile == 0, (n, tile)
    assert 0 < depth <= tile, (depth, tile)
    assert n // tile <= MAX_PROGRAMS, (n, tile)
    out_dtype = out_dtype or compute_dtype
    views = list(tables) if tables_are_views else [
        dma128_view(t) for t in tables]
    x2 = jnp.repeat(x.astype(jnp.float32), 2, axis=0)
    run = _build_fused_fwd(
        tuple(float(s) for s in scales), tuple(int(b) for b in nbs),
        int(n_feat), n, tile, depth, jnp.dtype(compute_dtype).name,
        "float32", _default_interpret(interpret))
    out2 = run(rows.astype(jnp.int32), x2, views)
    return _unpack_interleaved(out2, n, len(scales),
                               n_feat).astype(out_dtype)


# --------------------------------------------------------------------- #
# DMA backward: the round-1 fused backward (pallas_encoder.
# interp_bwd_fused — lane math + VMEM-resident table-grad accumulator)
# lost in-program because its [N, 64F] feats operand (the XLA re-gather
# under remat) still crossed the kernel boundary through HBM. This
# variant re-gathers the rows in-kernel with the same depth-pipelined
# dma128 read, so the boundary carries only (rows, x, g) in and
# (d_table, d_x) out. Table-grad update rows are built in the canonical
# [tile, 64F] layout (they depend only on x and g, not the DMA'd feats)
# and accumulated into the VMEM-resident output block; only the position
# gradient consumes the interleaved re-gathered values.
# --------------------------------------------------------------------- #


@functools.lru_cache(maxsize=None)
def _build_fused_bwd(scale: float, nb: int, n_rows: int, n_feat: int,
                     n: int, tile: int, depth: int, dtype_name: str,
                     accum_dtype_name: str, interpret: bool = False):
    """(rows [N] i32, x [N,3], x2 [2N,3], g [N,F], g2 [2N,F],
    view f32[R, 128]) -> (d_table [R_pad, 64F] accum_dtype,
    dxp [2N, 3] f32 — fold row pairs for d_x)."""
    from cednerf_tpu.ops.pallas_scatter import accum_rows_aligned

    F = n_feat
    assert 32 * F == DMA_LANES, (F, "dma128 requires n_feat == 4")
    W = CORNERS_PER_BRICK * F
    cdtype = jnp.dtype(dtype_name)
    adt = jnp.dtype(accum_dtype_name)
    n_rows_pad = -(-n_rows // 8) * 8

    def kernel(rows_s_ref, x_ref, x2_ref, g_ref, g2_ref, view_ref,
               out_ref, dxp_ref, scr, upd_scr, sems):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # in-kernel re-gather: view[rows[j]] -> scr[j] (f32 128-lane)
        _pipelined_row_dma(lambda j: rows_s_ref[j // 8, j % 8],
                           view_ref, scr, sems, depth, tile)

        # --- canonical-layout table-grad update rows (x, g only) ---
        lane_full = [_lane_axis_index(a, F, tile) for a in range(3)]
        ws_f, _, _ = _lane_weights(x_ref[...], scale, nb, lane_full,
                                   cdtype, False)
        g_t = g_ref[...].astype(cdtype)
        gout = pltpu.repeat(g_t, CORNERS_PER_BRICK, axis=1)  # [T, 64F]
        # ws[0] * (ws[1] * ws[2]): interp_bwd_fused's bf16 multiply order,
        # so update rows stay bit-identical to the round-1 fused backward
        upd_scr[...] = ((ws_f[0] * (ws_f[1] * ws_f[2])) * gout).astype(adt)

        # --- interleaved-layout position gradient (needs the feats) ---
        vals16 = pltpu.bitcast(scr[...], jnp.bfloat16)  # [2T, 128]
        lane_i = [_lane_axis_index(a, 2, 2 * tile) for a in range(3)]
        ws, dws, oks = _lane_weights(x2_ref[...], scale, nb, lane_i,
                                     cdtype, True)
        # g2[2j+p, m] = g[j, 2*(m%2) + p]: select by lane parity from the
        # row-expanded cotangent block
        lane = jax.lax.broadcasted_iota(jnp.int32, (2 * tile, DMA_LANES), 1)
        parity = jax.lax.broadcasted_iota(jnp.int32,
                                          (2 * tile, DMA_LANES), 0) % 2
        feat = 2 * (lane % 2) + parity
        g2 = jnp.zeros((2 * tile, DMA_LANES), cdtype)
        for f in range(F):
            g2 = g2 + (feat == f).astype(cdtype) * g2_ref[...][:, f:f + 1]
        h = vals16.astype(cdtype) * g2
        sc = jnp.float32(scale)
        d0 = jnp.sum((h * (dws[0] * ws[1] * ws[2])).astype(jnp.float32),
                     axis=-1, keepdims=True) * oks[:, 0:1] * sc
        d1 = jnp.sum((h * (ws[0] * dws[1] * ws[2])).astype(jnp.float32),
                     axis=-1, keepdims=True) * oks[:, 1:2] * sc
        d2 = jnp.sum((h * (ws[0] * ws[1] * dws[2])).astype(jnp.float32),
                     axis=-1, keepdims=True) * oks[:, 2:3] * sc
        dxp_ref[...] = jnp.concatenate([d0, d1, d2], axis=1)

        accum_rows_aligned(out_ref, rows_s_ref, upd_scr, tile)

    grid = (n // tile,)

    def run(rows, x, x2, g, g2, view):
        d_table, dxp = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile // 8, 8), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * tile, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, F), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * tile, F), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=(
                pl.BlockSpec((n_rows_pad, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * tile, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_rows_pad, W), adt),
                jax.ShapeDtypeStruct((2 * n, 3), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((tile, DMA_LANES), jnp.float32),
                pltpu.VMEM((tile, W), adt),
                pltpu.SemaphoreType.DMA((depth,)),
            ],
            interpret=interpret,
        )(rows.astype(jnp.int32).reshape(n // 8, 8),
          x.astype(jnp.float32), x2, g, g2, view)
        return d_table[:n_rows], dxp

    return run


def fused_encode_bwd(x, g, rows, table, *, scale: float, nb: int,
                     n_rows: int, n_feat: int,
                     compute_dtype=jnp.bfloat16, accum_dtype=jnp.float32,
                     tile: int = 256, depth: int = 8, interpret=None,
                     table_is_view: bool = False):
    """Single-level fused backward with in-kernel row re-gather (dma128).

    x: [N,3]; g: [N,F] cotangent; rows: [N] gather indices; table:
    [n_rows, 64F] brick table (or its f32[n_rows, 128] DMA view when
    table_is_view). Returns (d_table [n_rows, 64F] accum_dtype in the
    CANONICAL lane layout, d_x [N,3] f32). Math identical to
    pallas_encoder.interp_bwd_fused, minus the [N, 64F] feats operand.
    n_feat must be 4.
    """
    n = x.shape[0]
    tile = dma_tile(n, tile) or tile
    assert n % tile == 0, (n, tile)
    assert 0 < depth <= tile, (depth, tile)
    assert n // tile <= MAX_PROGRAMS, (n, tile)
    view = table if table_is_view else dma128_view(table)
    cdt = jnp.dtype(compute_dtype)
    g = g.astype(cdt)
    x2 = jnp.repeat(x.astype(jnp.float32), 2, axis=0)
    g2 = jnp.repeat(g, 2, axis=0)
    run = _build_fused_bwd(float(scale), int(nb), int(n_rows), int(n_feat),
                           n, tile, depth, cdt.name,
                           jnp.dtype(accum_dtype).name,
                           _default_interpret(interpret))
    d_table, dxp = run(rows, x, x2, g, g2, view)
    d_x = dxp[0::2] + dxp[1::2]
    return d_table, d_x
