"""Round-3 fused encoder forward: per-row DMA gather + all-levels interp.

The 2026-08-19/20 measurement campaign (docs/PERF_PLAN.md) established:

  * the encoder is ~75% of the train step and every XLA-level layout /
    row-width / fusion arrangement is exhausted (sessions 6-13);
  * a Pallas kernel only pays on v5e when ONE boundary replaces many ops
    (per-level kernels measured as in-program losses: the pallas_call
    boundary forces [N, 64F] intermediates through HBM that XLA would
    have fused away);
  * the tunnel's remote Mosaic compiler accepts per-row DMA only inside
    a narrow envelope — f32 rows, 128-lane multiples, modest grids
    (tools/bisect_pallas.py k4/k5/k8 PASS; bf16 rows k7, 32-lane rows
    k10, 4096-program grids k9 CRASH it).

This kernel is the one shape that clears both bars: ONE pallas_call for
the whole multi-resolution encode — L per-sample row DMAs (depth-
pipelined, HBM -> VMEM scratch) + compare-built trilinear lane math +
corner reduction, per sample tile. The [N, 64F] gathered-row arrays never
exist in HBM; XLA sees x, L row-index vectors, L tables in, and the
packed [N, L*F] feature block out.

Reference role: tiny-cuda-nn's fully-fused HashGrid encoding
(model.py:242-252; math spec hash_encoder_half.py:66-160) — the gather
inner loop is the measured-on-silicon DMA pipeline from
ops/pallas_gather.py, the lane math is ops/pallas_encoder.py's.

Tables are f32 at full row width (64F lanes). The brick params are bf16;
the caller converts once per step (one 8 MB copy per level, ~20 us) —
f32 rows are a compiler-envelope requirement (bf16 row DMA crashes the
remote Mosaic build, bisect k7), not a numerics choice.
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


@functools.lru_cache(maxsize=None)
def _build_fused_fwd(scales: Tuple[float, ...], nbs: Tuple[int, ...],
                     n_feat: int, n: int, tile: int, depth: int,
                     dtype_name: str, out_dtype_name: str,
                     interpret: bool = False):
    """(rows [L, N] i32, x [N, 3] f32, L x table f32[R_l, 64F]) -> [N, L*F]."""
    L = len(scales)
    F = n_feat
    W = CORNERS_PER_BRICK * F
    cdtype = jnp.dtype(dtype_name)
    out_dtype = jnp.dtype(out_dtype_name)

    def kernel(rows_ref, x_ref, *refs):
        tables = refs[:L]
        out_ref = refs[L]
        feat_scr = refs[L + 1]
        sems = refs[L + 2]

        lane_idx = [_lane_axis_index(a, F, tile) for a in range(3)]
        for lvl in range(L):
            # depth-pipelined per-row DMA: table_l[rows[l, j]] -> scratch[j]
            def copy(j, lvl=lvl):
                return pltpu.make_async_copy(
                    tables[lvl].at[pl.ds(rows_ref[lvl, j], 1), :],
                    feat_scr.at[pl.ds(j, 1), :],
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

            ws, _, _ = _lane_weights(x_ref[...], scales[lvl], nbs[lvl],
                                     lane_idx, cdtype, False)
            lanes = ws[0] * ws[1] * ws[2]
            prod = feat_scr[...].astype(cdtype) * lanes
            out = _reduce_corners(prod.astype(jnp.float32), F)
            out_ref[:, lvl * F:(lvl + 1) * F] = out.astype(out_ref.dtype)

    grid = (n // tile,)
    in_specs = [
        # row indices as an SMEM block (DMA source offsets must be scalars;
        # scalar-prefetching [L, N] would not fit SMEM at the bench N)
        pl.BlockSpec((L, tile), lambda i: (0, i), memory_space=pltpu.SMEM),
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(memory_space=pltpu.ANY) for _ in range(L)]
    out_specs = pl.BlockSpec((tile, L * F), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)

    def run(rows, x, tables):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=jax.ShapeDtypeStruct((n, L * F), out_dtype),
            scratch_shapes=[
                pltpu.VMEM((tile, W), jnp.float32),
                pltpu.SemaphoreType.DMA((depth,)),
            ],
            interpret=interpret,
        )(rows, x, *tables)

    return run


def fused_encode_fwd(x, tables: Sequence[jnp.ndarray], rows,
                     scales: Sequence[float], nbs: Sequence[int],
                     n_feat: int, compute_dtype=jnp.bfloat16,
                     out_dtype=None, tile: int = 512, depth: int = 8,
                     interpret=None):
    """All-levels brick encode with in-kernel row gather.

    x: [N, 3] unit-cube positions; tables: L x f32[R_l, 64F] brick tables
    (f32 row DMA is the compiler envelope — bf16 params must be converted
    by the caller); rows: [L, N] int32 per-level brick row indices
    (brick_grid._level_geom math, computed in XLA where 1-D ops are ~free).
    Returns [N, L*F] features, bit-matching the gather+interp_fwd path.
    """
    n = x.shape[0]
    tile = dma_tile(n, tile) or tile
    assert n % tile == 0, (n, tile)
    assert 0 < depth <= tile, (depth, tile)
    assert n // tile <= MAX_PROGRAMS, (n, tile)
    out_dtype = out_dtype or compute_dtype
    run = _build_fused_fwd(
        tuple(float(s) for s in scales), tuple(int(b) for b in nbs),
        int(n_feat), n, tile, depth, jnp.dtype(compute_dtype).name,
        jnp.dtype(out_dtype).name, _default_interpret(interpret))
    return run(rows.astype(jnp.int32), x.astype(jnp.float32), list(tables))


# --------------------------------------------------------------------- #
# DMA backward: the round-1 fused backward (pallas_encoder.
# interp_bwd_fused — lane math + VMEM-resident table-grad accumulator)
# lost in-program because its [N, 64F] feats operand (the XLA re-gather
# under remat) still crossed the kernel boundary through HBM. This
# variant re-gathers the rows in-kernel with the same depth-pipelined
# DMA as the forward, so the boundary carries only (rows, x, g) in and
# (d_table, d_x) out.
# --------------------------------------------------------------------- #


@functools.lru_cache(maxsize=None)
def _build_fused_bwd(scale: float, nb: int, n_rows: int, n_feat: int,
                     n: int, tile: int, depth: int, dtype_name: str,
                     accum_dtype_name: str, interpret: bool = False):
    """(rows [N] i32, x [N,3], g [N,F], table f32[R, 64F])
    -> (d_table [R_pad, 64F] accum_dtype, d_x [N, 3] f32)."""
    from cednerf_tpu.ops.pallas_scatter import accum_rows_aligned

    F = n_feat
    W = CORNERS_PER_BRICK * F
    cdtype = jnp.dtype(dtype_name)
    adt = jnp.dtype(accum_dtype_name)
    n_rows_pad = -(-n_rows // 8) * 8

    def kernel(rows_s_ref, x_ref, g_ref, table_ref, out_ref, dx_ref,
               feat_scr, upd_scr, sems):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        # in-kernel re-gather: table[rows[j]] -> feat_scr[j]
        def copy(j):
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(rows_s_ref[j // 8, j % 8], 1), :],
                feat_scr.at[pl.ds(j, 1), :],
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

        lane_idx = [_lane_axis_index(a, F, tile) for a in range(3)]
        ws, dws, oks = _lane_weights(x_ref[...], scale, nb, lane_idx,
                                     cdtype, True)
        g_t = g_ref[...].astype(cdtype)
        gout = pltpu.repeat(g_t, CORNERS_PER_BRICK, axis=1)
        wyz = ws[1] * ws[2]
        lanes = ws[0] * wyz
        upd_scr[...] = (lanes * gout).astype(adt)

        h = feat_scr[...].astype(cdtype) * gout
        sc = jnp.float32(scale)
        d0 = jnp.sum((h * (dws[0] * wyz)).astype(jnp.float32),
                     axis=-1, keepdims=True) * oks[:, 0:1] * sc
        d1 = jnp.sum((h * (ws[0] * dws[1] * ws[2])).astype(jnp.float32),
                     axis=-1, keepdims=True) * oks[:, 1:2] * sc
        d2 = jnp.sum((h * (ws[0] * ws[1] * dws[2])).astype(jnp.float32),
                     axis=-1, keepdims=True) * oks[:, 2:3] * sc
        dx_ref[...] = jnp.concatenate([d0, d1, d2], axis=1)

        accum_rows_aligned(out_ref, rows_s_ref, upd_scr, tile)

    grid = (n // tile,)

    def run(rows, x, g, table):
        d_table, d_x = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile // 8, 8), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((tile, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, F), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
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
                pltpu.VMEM((tile, W), jnp.float32),
                pltpu.VMEM((tile, W), adt),
                pltpu.SemaphoreType.DMA((depth,)),
            ],
            interpret=interpret,
        )(rows.astype(jnp.int32).reshape(n // 8, 8),
          x.astype(jnp.float32), g, table)
        return d_table[:n_rows], d_x

    return run


def fused_encode_bwd(x, g, rows, table, *, scale: float, nb: int,
                     n_rows: int, n_feat: int,
                     compute_dtype=jnp.bfloat16, accum_dtype=jnp.float32,
                     tile: int = 256, depth: int = 8, interpret=None):
    """Single-level fused backward with in-kernel row re-gather.

    x: [N,3]; g: [N,F] cotangent; rows: [N] gather indices; table:
    f32[n_rows, 64F] (the forward's DMA view — f32 rows are the
    compiler envelope). Returns (d_table [n_rows, 64F] accum_dtype,
    d_x [N,3] f32). Math identical to pallas_encoder.interp_bwd_fused,
    minus the [N, 64F] feats operand.
    """
    n = x.shape[0]
    tile = dma_tile(n, tile) or tile
    assert n % tile == 0, (n, tile)
    assert 0 < depth <= tile, (depth, tile)
    assert n // tile <= MAX_PROGRAMS, (n, tile)
    run = _build_fused_bwd(float(scale), int(nb), int(n_rows), int(n_feat),
                           n, tile, depth, jnp.dtype(compute_dtype).name,
                           jnp.dtype(accum_dtype).name,
                           _default_interpret(interpret))
    return run(rows, x, g.astype(jnp.dtype(compute_dtype)), table)
