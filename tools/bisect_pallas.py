"""Bisect the Mosaic compile failure of ops/pallas_gather.dma_gather.

Session-8 (2026-08-19): every dma_gather config died in the tunnel's remote
compile with `HTTP 500: tpu_compile_helper subprocess exit code 1` — the
Mosaic error itself is swallowed server-side. Round-1 Pallas kernels
(ops/pallas_scatter, pallas_interp, pallas_compact) compiled fine on the
same tunnel, so the failure is kernel-specific. This ladder isolates the
feature that kills it:

  k0 elementwise add-one (whole-array block)          — infra sanity
  k1 tiled grid, block in/out                         — pipeline sanity
  k2 ANY-space table + static-index row DMA, 1 sem    — basic HBM->VMEM DMA
  k3 scalar-prefetch idx + dynamic-index row DMA      — SMEM-scalar ds()
  k4 fori_loop per-row DMA, depth=1 (start+wait)      — loop-carried DMA
  k5 sem array + modulo depth pipelining (depth=4)    — the full pattern
  k6 ops/pallas_gather.dma_gather (tile=256, depth=4) — the shipped kernel

Usage:  python tools/bisect_pallas.py [--interpret]
Prints PASS/FAIL per rung with the first error line; exits 0 iff all pass.
--interpret runs the same ladder in interpret mode (CPU, logic-only).
"""

import argparse
import functools
import sys
import traceback

sys.path.insert(0, ".")

import jax

if "--interpret" in sys.argv:
    # beat the container sitecustomize's axon/TPU registration so interpret
    # runs do not contend with the chip queue (see tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, W, N, TILE = 4096, 128, 1024, 256


def k0(interpret):
    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    x = jnp.arange(8 * W, dtype=jnp.float32).reshape(8, W)
    out = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                         interpret=interpret)(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) + 1.0)


def k1(interpret):
    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    x = jnp.arange(N * W, dtype=jnp.float32).reshape(N, W)
    out = pl.pallas_call(
        kern,
        grid=(N // TILE,),
        in_specs=[pl.BlockSpec((TILE, W), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret)(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)


def k2(interpret):
    """One static-index row DMA per tile from an ANY-space table."""
    def kern(t_ref, o_ref, sem):
        o_ref[...] = jnp.zeros_like(o_ref)
        cp = pltpu.make_async_copy(t_ref.at[pl.ds(3, 1), :],
                                   o_ref.at[pl.ds(0, 1), :], sem)
        cp.start()
        cp.wait()

    t = jnp.arange(R * W, dtype=jnp.float32).reshape(R, W)
    out = pl.pallas_call(
        kern,
        grid=(N // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, W), t.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        interpret=interpret)(t)
    got = np.asarray(out)[::TILE]
    want = np.broadcast_to(np.asarray(t)[3:4], got.shape)
    np.testing.assert_allclose(got, want)


def _prefetch_call(kern, t, idx, *, scratch, interpret):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TILE, W), lambda i, idx_ref: (i, 0)),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((N, W), t.dtype),
                          grid_spec=grid_spec, interpret=interpret)(idx, t)


def k3(interpret):
    """Dynamic-index (scalar-prefetch SMEM) single row DMA per tile."""
    def kern(idx_ref, t_ref, o_ref, sem):
        base = pl.program_id(0) * TILE
        o_ref[...] = jnp.zeros_like(o_ref)
        cp = pltpu.make_async_copy(t_ref.at[pl.ds(idx_ref[base], 1), :],
                                   o_ref.at[pl.ds(0, 1), :], sem)
        cp.start()
        cp.wait()

    t = jnp.arange(R * W, dtype=jnp.float32).reshape(R, W)
    idx = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, R, jnp.int32)
    out = _prefetch_call(kern, t, idx, scratch=[pltpu.SemaphoreType.DMA],
                         interpret=interpret)
    got = np.asarray(out)[::TILE]
    want = np.asarray(t)[np.asarray(idx)[::TILE]]
    np.testing.assert_allclose(got, want)


def k4(interpret):
    """Unpipelined per-row DMA loop (start+wait inside fori_loop)."""
    def kern(idx_ref, t_ref, o_ref, sem):
        base = pl.program_id(0) * TILE

        def body(j, c):
            cp = pltpu.make_async_copy(
                t_ref.at[pl.ds(idx_ref[base + j], 1), :],
                o_ref.at[pl.ds(j, 1), :], sem)
            cp.start()
            cp.wait()
            return c

        jax.lax.fori_loop(0, TILE, body, 0)

    t = jnp.arange(R * W, dtype=jnp.float32).reshape(R, W)
    idx = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, R, jnp.int32)
    out = _prefetch_call(kern, t, idx, scratch=[pltpu.SemaphoreType.DMA],
                         interpret=interpret)
    np.testing.assert_allclose(np.asarray(out), np.asarray(t)[np.asarray(idx)])


def k5(interpret):
    """Depth-4 modulo pipelining with a DMA semaphore array."""
    depth = 4

    def kern(idx_ref, t_ref, o_ref, sems):
        base = pl.program_id(0) * TILE

        def copy(j):
            return pltpu.make_async_copy(
                t_ref.at[pl.ds(idx_ref[base + j], 1), :],
                o_ref.at[pl.ds(j, 1), :], sems.at[j % depth])

        def body(j, c):
            @pl.when(j >= depth)
            def _():
                copy(j - depth).wait()
            copy(j).start()
            return c

        jax.lax.fori_loop(0, TILE, body, 0)

        def tail(j, c):
            copy(TILE - depth + j).wait()
            return c

        jax.lax.fori_loop(0, depth, tail, 0)

    t = jnp.arange(R * W, dtype=jnp.float32).reshape(R, W)
    idx = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, R, jnp.int32)
    out = _prefetch_call(kern, t, idx,
                         scratch=[pltpu.SemaphoreType.DMA((depth,))],
                         interpret=interpret)
    np.testing.assert_allclose(np.asarray(out), np.asarray(t)[np.asarray(idx)])


def _shipped(interpret, *, rows=R, n=N, w=W, tile=TILE, dtype=jnp.float32):
    from cednerf_tpu.ops.pallas_gather import dma_gather
    key = jax.random.PRNGKey(0)
    t = jax.random.normal(key, (rows, w), jnp.float32).astype(dtype)
    idx = jax.random.randint(key, (n,), 0, rows, jnp.int32)
    if interpret:
        # dma_gather is jitted without interpret; validate via take instead
        return
    out = dma_gather(t, idx, tile=tile, depth=4)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(t, np.float32)[np.asarray(idx)])


def k6(interpret):
    _shipped(interpret)


# Session-12 narrowed the space: k6 (f32, W=128, R=4096, N=1024) PASSES
# while every probe config (bf16, W=32-256, R>=16384, N=1M) gets a fast
# HTTP 500 (tpu_compile_helper subprocess crash). One variable at a time:
def k7(interpret):
    """k6 but bf16 rows — is the crash the sub-(16,128)-tile bf16 row?"""
    _shipped(interpret, dtype=jnp.bfloat16)


def k8(interpret):
    """k6 but a cell-table row count (442368)."""
    _shipped(interpret, rows=442368)


def k9(interpret):
    """k6 but 1M gathered rows (4096-program grid)."""
    _shipped(interpret, n=1 << 20)


def k10(interpret):
    """k6 but 32-lane rows (the F=4 cell-row width)."""
    _shipped(interpret, w=32)


# Session-13 verdict: deterministic 500s on bf16 rows (k7), 4096-program
# grids (k9), and 32-lane rows (k10); f32 + W=128 + small grids pass
# (k4/k5/k8). k11-k14 map the usable envelope for a fused-encoder kernel:
def k11(interpret):
    """bf16[R,256] rows DMA'd as their bit-identical f32[R,128] view —
    the bitcast workaround that would let bf16 brick tables use row DMA."""
    from cednerf_tpu.ops.pallas_gather import dma_gather
    key = jax.random.PRNGKey(0)
    t16 = jax.random.normal(key, (R, 256), jnp.float32).astype(jnp.bfloat16)
    t32 = jax.lax.bitcast_convert_type(
        t16.reshape(R, 128, 2), jnp.float32).reshape(R, 128)
    idx = jax.random.randint(key, (N,), 0, R, jnp.int32)
    if interpret:
        return
    out32 = dma_gather(t32, idx, tile=TILE, depth=4)
    out16 = jax.lax.bitcast_convert_type(
        out32.reshape(N, 128, 1), jnp.bfloat16).reshape(N, 256)
    np.testing.assert_allclose(np.asarray(out16, np.float32),
                               np.asarray(t16, np.float32)[np.asarray(idx)])


def k12(interpret):
    """1024-program grid (f32, W=128)."""
    _shipped(interpret, n=262144)


def k13(interpret):
    """2048-program grid."""
    _shipped(interpret, n=524288)


def k14(interpret):
    """1M rows via 512 programs of tile=2048 — the realistic config."""
    _shipped(interpret, n=1 << 20, tile=2048)


def k15(interpret):
    """ops/pallas_fused.py fused_encode_fwd at toy shapes — the round-3
    kernel's full structural feature set in one rung: SMEM row-index
    blocks, multiple ANY-space tables, f32 W=256 row DMA, narrow
    (L*F-lane) output blocks, interleaved DMA + lane math."""
    import math
    from cednerf_tpu.ops import brick_grid as bg
    from cednerf_tpu.ops.pallas_fused import fused_encode_fwd
    key = jax.random.PRNGKey(0)
    n, levels, F = 1024, 4, 4
    base_res, max_res = 16, 256
    log_b = math.log(max_res / base_res) / (levels - 1)
    x = jax.random.uniform(jax.random.fold_in(key, 99), (n, 3))
    scales, nbs, tables, rows_l = [], [], [], []
    for lvl in range(levels):
        scale = bg.level_scale(lvl, log_b, base_res)
        nb = max(1, int(np.ceil((np.ceil(scale) + 1) / bg.BRICK_CELLS)))
        hashed = lvl >= 2
        n_rows = 512 if hashed else nb ** 3
        rows, _, _, _ = bg._level_geom(x, scale, nb, hashed, n_rows)
        tables.append(jax.random.normal(jax.random.fold_in(key, lvl),
                                        (n_rows, 64 * F), jnp.float32))
        scales.append(float(scale))
        nbs.append(nb)
        rows_l.append(rows)
    rows = jnp.stack(rows_l, 0)
    got = fused_encode_fwd(x, tables, rows, scales, nbs, F, tile=256,
                           depth=4, interpret=interpret or None)
    # numeric parity is CPU-tested (tests/test_pallas_fused.py); this rung
    # answers compile+run on the remote Mosaic build
    np.asarray(got[:8])


def k16(interpret):
    """fused_encode_fwd at bench-like scale: 8 levels, 16384-row hashed
    tables, 262k samples, tile=512 (512-program grid)."""
    import math
    from cednerf_tpu.ops import brick_grid as bg
    from cednerf_tpu.ops.pallas_fused import fused_encode_fwd
    key = jax.random.PRNGKey(0)
    n, levels, F = 1 << 18, 8, 4
    base_res, max_res = 16, 1024
    log_b = math.log(max_res / base_res) / (levels - 1)
    x = jax.random.uniform(jax.random.fold_in(key, 99), (n, 3))
    scales, nbs, tables, rows_l = [], [], [], []
    for lvl in range(levels):
        scale = bg.level_scale(lvl, log_b, base_res)
        nb = max(1, int(np.ceil((np.ceil(scale) + 1) / bg.BRICK_CELLS)))
        hashed = nb ** 3 > 16384
        n_rows = 16384 if hashed else nb ** 3
        rows, _, _, _ = bg._level_geom(x, scale, nb, hashed, n_rows)
        tables.append(jax.random.normal(jax.random.fold_in(key, lvl),
                                        (n_rows, 64 * F), jnp.float32))
        scales.append(float(scale))
        nbs.append(nb)
        rows_l.append(rows)
    rows = jnp.stack(rows_l, 0)
    got = fused_encode_fwd(x, tables, rows, scales, nbs, F, tile=512,
                           depth=8, interpret=interpret or None)
    np.asarray(got[:8])


def k17(interpret):
    """fused_encode_bwd (DMA re-gather + VMEM accumulator) at bench-like
    shapes: one 16384-row level, 262k samples, tile=256."""
    import math
    from cednerf_tpu.ops import brick_grid as bg
    from cednerf_tpu.ops.pallas_fused import fused_encode_bwd
    key = jax.random.PRNGKey(0)
    n, F = 1 << 18, 4
    scale, nb, n_rows = 341.0, 128, 16384
    x = jax.random.uniform(jax.random.fold_in(key, 99), (n, 3))
    rows, _, _, _ = bg._level_geom(x, scale, nb, True, n_rows)
    table = jax.random.normal(key, (n_rows, 64 * F), jnp.float32)
    g = jax.random.normal(jax.random.fold_in(key, 7), (n, F), jnp.float32)
    dt, dx = fused_encode_bwd(x, g, rows, table, scale=scale, nb=nb,
                              n_rows=n_rows, n_feat=F, tile=256, depth=8,
                              accum_dtype=jnp.bfloat16,
                              interpret=interpret or None)
    np.asarray(dx[:8])


# Session-19: k15/k16/k17 ALL crash the remote build while every k4-k14
# envelope rung passes. The fused kernels differ from the passing shape in
# six variables — k18-k23 isolate them one at a time:
#   k18 DMA row width 256 (passing rungs copied exactly 128 f32 lanes)
#   k19 row indices via a 2-D SMEM BlockSpec (vs scalar-prefetch)
#   k20 multiple ANY-space tables DMA'd in one kernel
#   k21 DMA destination = VMEM scratch, then math -> output block
#       (passing rungs DMA'd straight into the output block)
#   k22 compare-built lane math + narrow (sub-128-lane) output block
#   k23 in-kernel pltpu.bitcast f32[.,128] -> bf16[.,256] (the k11
#       workaround moved inside the kernel, where the fused math needs it)


def _idx_t(rows=R, w=W, n=N):
    key = jax.random.PRNGKey(0)
    t = jax.random.normal(key, (rows, w), jnp.float32)
    idx = jax.random.randint(key, (n,), 0, rows, jnp.int32)
    return t, idx


def _pipe_copy(idx_read, t_ref, dst, sems, depth, tile):
    """The k5 depth-pipelined per-row DMA loop."""
    def copy(j):
        return pltpu.make_async_copy(
            t_ref.at[pl.ds(idx_read(j), 1), :],
            dst.at[pl.ds(j, 1), :], sems.at[j % depth])

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


def k18(interpret):
    """k5 pipelined DMA but 256-lane f32 rows (the fused kernel's row
    shape at F=4: 64F = 256 f32 lanes; every passing rung used 128)."""
    depth, w = 4, 256

    def kern(idx_ref, t_ref, o_ref, sems):
        base = pl.program_id(0) * TILE
        _pipe_copy(lambda j: idx_ref[base + j], t_ref, o_ref, sems,
                   depth, TILE)

    t, idx = _idx_t(w=w)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(N // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TILE, w), lambda i, idx_ref: (i, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))])
    out = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((N, w), t.dtype),
                         grid_spec=grid_spec, interpret=interpret)(idx, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(t)[np.asarray(idx)])


def k19(interpret):
    """k5 but row indices via a 2-D SMEM BlockSpec (the fused kernel's
    [L, tile] rows input) instead of scalar prefetch."""
    depth, L = 4, 4

    def kern(rows_ref, t_ref, o_ref, sems):
        _pipe_copy(lambda j: rows_ref[0, j], t_ref, o_ref, sems, depth, TILE)

    t, idx = _idx_t()
    rows = jnp.tile(idx[None, :], (L, 1))
    out = pl.pallas_call(
        kern,
        grid=(N // TILE,),
        in_specs=[pl.BlockSpec((L, TILE), lambda i: (0, i),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, W), t.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
        interpret=interpret)(rows, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(t)[np.asarray(idx)])


def k20(interpret):
    """k5 but FOUR ANY-space tables, each DMA'd to a quarter of the
    output rows (multi-table DMA in one kernel)."""
    depth, L = 4, 4
    q = TILE // L

    def kern(idx_ref, *refs):
        tabs, o_ref, sems = refs[:L], refs[L], refs[L + 1]
        base = pl.program_id(0) * TILE
        # sequential per-table pipelined loops into disjoint row ranges
        for lvl in range(L):
            def copy(j, lvl=lvl):
                return pltpu.make_async_copy(
                    tabs[lvl].at[pl.ds(idx_ref[base + lvl * q + j], 1), :],
                    o_ref.at[pl.ds(lvl * q + j, 1), :], sems.at[j % depth])

            def body(j, c):
                @pl.when(j >= depth)
                def _():
                    copy(j - depth).wait()
                copy(j).start()
                return c

            jax.lax.fori_loop(0, q, body, 0)

            def tail(j, c):
                copy(q - depth + j).wait()
                return c

            jax.lax.fori_loop(0, depth, tail, 0)

    key = jax.random.PRNGKey(0)
    tabs = [jax.random.normal(jax.random.fold_in(key, l), (R, W), jnp.float32)
            for l in range(L)]
    idx = jax.random.randint(key, (N,), 0, R, jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(N // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY) for _ in range(L)],
        out_specs=pl.BlockSpec((TILE, W), lambda i, idx_ref: (i, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))])
    out = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((N, W),
                                                              jnp.float32),
                         grid_spec=grid_spec, interpret=interpret)(idx, *tabs)
    got = np.asarray(out).reshape(N // TILE, L, q, W)
    want_idx = np.asarray(idx).reshape(N // TILE, L, q)
    for lvl in range(L):
        np.testing.assert_allclose(got[:, lvl], np.asarray(tabs[lvl])
                                   [want_idx[:, lvl]])


def k21(interpret):
    """k5 but DMA lands in a VMEM scratch, then scratch -> output block
    through a vector op (the fused kernel's staging shape)."""
    depth = 4

    def kern(idx_ref, t_ref, o_ref, scr, sems):
        base = pl.program_id(0) * TILE
        _pipe_copy(lambda j: idx_ref[base + j], t_ref, scr, sems,
                   depth, TILE)
        o_ref[...] = scr[...] * 2.0

    t, idx = _idx_t()
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(N // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((TILE, W), lambda i, idx_ref: (i, 0)),
        scratch_shapes=[pltpu.VMEM((TILE, W), jnp.float32),
                        pltpu.SemaphoreType.DMA((depth,))])
    out = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((N, W), t.dtype),
                         grid_spec=grid_spec, interpret=interpret)(idx, t)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(t)[np.asarray(idx)] * 2.0)


def k22(interpret):
    """k21 plus compare-built lane weights and a narrow (16-lane) output
    block (the fused kernel's interp math + out shape)."""
    depth, F = 4, 4

    def kern(idx_ref, t_ref, x_ref, o_ref, scr, sems):
        base = pl.program_id(0) * TILE
        _pipe_copy(lambda j: idx_ref[base + j], t_ref, scr, sems,
                   depth, TILE)
        lane = jax.lax.broadcasted_iota(jnp.int32, (TILE, W), 1)
        w = jnp.where((lane // F) % 2 == 0, x_ref[...][:, :1],
                      1.0 - x_ref[...][:, :1])
        prod = scr[...] * w
        acc = jnp.zeros((TILE, F), jnp.float32)
        for c in range(W // F):
            acc = acc + prod[:, c * F:(c + 1) * F]
        o_ref[...] = acc

    t, idx = _idx_t()
    x = jax.random.uniform(jax.random.PRNGKey(5), (N, 3))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(N // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((TILE, 3), lambda i, idx_ref: (i, 0))],
        out_specs=pl.BlockSpec((TILE, F), lambda i, idx_ref: (i, 0)),
        scratch_shapes=[pltpu.VMEM((TILE, W), jnp.float32),
                        pltpu.SemaphoreType.DMA((depth,))])
    out = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((N, F),
                                                              jnp.float32),
                         grid_spec=grid_spec, interpret=interpret)(idx, t, x)
    rows = np.asarray(t)[np.asarray(idx)]
    lane = np.arange(W)[None, :]
    wnp = np.where((lane // F) % 2 == 0, np.asarray(x)[:, :1],
                   1.0 - np.asarray(x)[:, :1])
    want = (rows * wnp).reshape(N, W // F, F).sum(1)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-5)


def k23(interpret):
    """k21 but the table is a bf16[R,256] brick row stored/DMA'd as its
    bit-identical f32[R,128] view, bitcast back to bf16 INSIDE the kernel.

    pltpu.bitcast packs along SUBLANES: f32[T,128] -> bf16[2T,128] where
    row 2i holds the even canonical lanes of bf16 row i and row 2i+1 the
    odd lanes (verified in interpret mode). The fused-encoder math consumes
    that layout directly (see k24); this rung just gates the bitcast op on
    the remote Mosaic build."""
    depth = 4

    def kern(idx_ref, t_ref, o_ref, scr, sems):
        base = pl.program_id(0) * TILE
        _pipe_copy(lambda j: idx_ref[base + j], t_ref, scr, sems,
                   depth, TILE)
        vals16 = pltpu.bitcast(scr[...], jnp.bfloat16)  # [2*TILE, 128]
        o_ref[...] = vals16.astype(jnp.float32)

    key = jax.random.PRNGKey(0)
    t16 = jax.random.normal(key, (R, 256), jnp.float32).astype(jnp.bfloat16)
    t32 = jax.lax.bitcast_convert_type(
        t16.reshape(R, 128, 2), jnp.float32).reshape(R, 128)
    idx = jax.random.randint(key, (N,), 0, R, jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(N // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((2 * TILE, 128), lambda i, idx_ref: (i, 0)),
        scratch_shapes=[pltpu.VMEM((TILE, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((depth,))])
    out = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((2 * N, 128),
                                                              jnp.float32),
                         grid_spec=grid_spec, interpret=interpret)(idx, t32)
    rows16 = np.asarray(t16, np.float32)[np.asarray(idx)]  # [N, 256]
    want = np.empty((2 * N, 128), np.float32)
    want[0::2] = rows16[:, 0::2]
    want[1::2] = rows16[:, 1::2]
    np.testing.assert_allclose(np.asarray(out), want)


def k24(interpret):
    """The full dma128 fused-encoder shape: bf16 row DMA'd as f32[.,128],
    in-kernel bitcast to the [2*TILE, 128] sublane-interleaved layout,
    sublane-parity iota + corner (lane//2) compare math, stride-2 lane
    reduction by MXU selector matmul, narrow interleaved output."""
    depth, F = 4, 4

    def kern(idx_ref, t_ref, x_ref, o_ref, scr, sems):
        base = pl.program_id(0) * TILE
        _pipe_copy(lambda j: idx_ref[base + j], t_ref, scr, sems,
                   depth, TILE)
        vals16 = pltpu.bitcast(scr[...], jnp.bfloat16)  # [2T, 128]
        corner = jax.lax.broadcasted_iota(jnp.int32, (2 * TILE, 128), 1) // 2
        w = jnp.where(corner % 2 == 0, x_ref[...][:, :1],
                      1.0 - x_ref[...][:, :1]).astype(jnp.bfloat16)
        prod = vals16 * w
        # stride-2 lane reduce: [2T, 128] x [128, 2] one-hot parity selector
        lane = jax.lax.broadcasted_iota(jnp.int32, (128, 2), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (128, 2), 1)
        sel = (lane % 2 == col).astype(jnp.bfloat16)
        o_ref[...] = jax.lax.dot_general(
            prod, sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    key = jax.random.PRNGKey(0)
    t16 = jax.random.normal(key, (R, 256), jnp.float32).astype(jnp.bfloat16)
    t32 = jax.lax.bitcast_convert_type(
        t16.reshape(R, 128, 2), jnp.float32).reshape(R, 128)
    idx = jax.random.randint(key, (N,), 0, R, jnp.int32)
    x = jax.random.uniform(jax.random.PRNGKey(5), (N, 3))
    x2 = jnp.repeat(x, 2, axis=0)  # row r -> sample r//2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(N // TILE,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec((2 * TILE, 3), lambda i, idx_ref: (i, 0))],
        out_specs=pl.BlockSpec((2 * TILE, 2), lambda i, idx_ref: (i, 0)),
        scratch_shapes=[pltpu.VMEM((TILE, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((depth,))])
    out = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((2 * N, 2),
                                                              jnp.float32),
                         grid_spec=grid_spec, interpret=interpret)(idx, t32, x2)
    rows16 = np.asarray(t16, np.float32)[np.asarray(idx)]  # [N, 256]
    inter = np.empty((2 * N, 128), np.float32)
    inter[0::2] = rows16[:, 0::2]
    inter[1::2] = rows16[:, 1::2]
    import ml_dtypes
    corner = np.arange(128)[None, :] // 2
    xe = np.repeat(np.asarray(x), 2, axis=0)
    wnp = np.where(corner % 2 == 0, xe[:, :1],
                   1 - xe[:, :1]).astype(ml_dtypes.bfloat16)
    # kernel multiplies in bf16 (product rounded to bf16), accumulates f32
    prod = (inter.astype(ml_dtypes.bfloat16) * wnp).astype(np.float32)
    want = np.stack([prod[:, 0::2].sum(1), prod[:, 1::2].sum(1)], axis=1)
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-2, atol=2e-2)


RUNGS = ["k0_elementwise", "k1_tiled", "k2_static_dma", "k3_dyn_idx_dma",
         "k4_loop_dma", "k5_pipelined", "k6_shipped", "k7_bf16",
         "k8_bigtable", "k9_bign", "k10_w32", "k11_bitcast",
         "k12_grid1024", "k13_grid2048", "k14_tile2048",
         "k15_fusedtoy", "k16_fusedbench", "k17_fusedbwd",
         "k18_w256dma", "k19_smemrows", "k20_multitable",
         "k21_scratchdst", "k22_mathnarrow", "k23_kernelbitcast",
         "k24_dma128fused"]


def run_one(name, interpret):
    fn = globals()[name.split("_")[0]]
    try:
        fn(interpret)
        print(f"{name:16s} PASS", flush=True)
        return True
    except Exception as e:  # noqa: BLE001 — report and continue bisect
        first = str(e).strip().splitlines()
        first = first[0] if first else repr(e)
        print(f"{name:16s} FAIL {type(e).__name__}: {first[:200]}",
              flush=True)
        if interpret:
            traceback.print_exc()
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--rung", help="run one rung in-process (internal)")
    ap.add_argument("--rung_timeout", type=int, default=240,
                    help="per-rung subprocess timeout, s — session-8 style "
                    "remote-compile hangs must not eat the whole ladder")
    ap.add_argument("--only", help="comma-list of rung names to run "
                    "(skip the already-verdicted prefix of the ladder)")
    args = ap.parse_args()
    if args.rung:
        sys.exit(0 if run_one(args.rung, args.interpret) else 1)

    print(f"backend: {jax.default_backend()} interpret={args.interpret}",
          flush=True)
    import subprocess
    ok = True
    rungs = RUNGS
    if args.only:
        wanted = set(args.only.split(","))
        rungs = [r for r in RUNGS if r in wanted or r.split("_")[0] in wanted]
        assert rungs, (args.only, RUNGS)
    for name in rungs:
        cmd = [sys.executable, __file__, "--rung", name]
        if args.interpret:
            cmd.append("--interpret")
        try:
            r = subprocess.run(cmd, timeout=args.rung_timeout,
                               capture_output=True, text=True)
            out = (r.stdout + r.stderr).strip().splitlines()
            tagged = [ln for ln in out if ln.startswith(name)]
            print(tagged[-1] if tagged
                  else f"{name:16s} DIED rc={r.returncode}: "
                       f"{out[-1][:160] if out else ''}", flush=True)
            ok &= r.returncode == 0
        except subprocess.TimeoutExpired:
            print(f"{name:16s} HANG >{args.rung_timeout}s "
                  f"(remote compile wedged)", flush=True)
            ok = False
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
