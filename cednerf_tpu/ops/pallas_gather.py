"""Pipelined per-row DMA gather — a probe at the v5e row-access wall.

Every hot op in this framework is bounded by XLA's random row access rates
(~300-430 M rows/s gather, ~150 M rows/s scatter-add on v5e; ROADMAP
measurements): at 1M samples x 6-12 row ops/step that wall alone caps the
encoder at a few M samples/s. XLA's gather is one kernel whose inner loop
the compiler schedules; this module asks whether hand-pipelined per-row
async DMAs (depth-D in flight, HBM -> VMEM) can beat that rate — the
"embedding lookup" pattern tiny-cuda-nn's CUDA tables get from hardware
gather units (reference role: tcnn HashGrid, model.py:242-252).

If dma_gather measures materially faster than jnp.take at the cell-row
shapes ([~442k, 8F] tables, 1M rows), the round-3 fused encoder kernel
(gather + interp + MLP in one Pallas program) inherits its inner loop from
here; if not, the row wall is a hardware property and the perf roadmap
stays on row-count reduction. Benchmarked by tools/profile_dma_gather.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(idx_ref, table_ref, out_ref, sems, *, tile: int,
                   depth: int):
    base = pl.program_id(0) * tile

    def copy(j):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(idx_ref[base + j], 1), :],
            out_ref.at[pl.ds(j, 1), :],
            sems.at[j % depth],
        )

    def body(j, carry):
        @pl.when(j >= depth)
        def _():
            copy(j - depth).wait()

        copy(j).start()
        return carry

    jax.lax.fori_loop(0, tile, body, 0)

    def tail(j, carry):
        copy(tile - depth + j).wait()
        return carry

    jax.lax.fori_loop(0, depth, tail, 0)


@functools.partial(jax.jit, static_argnames=("tile", "depth"))
def dma_gather(table, idx, *, tile: int = 512, depth: int = 8):
    """out[i, :] = table[idx[i], :] via depth-pipelined per-row DMAs.

    table: [R, W] (stays in HBM; W a multiple of 128 lanes for clean rows);
    idx: [N] int32, N % tile == 0. Semantics of jnp.take(table, idx, 0).
    """
    n = idx.shape[0]
    assert n % tile == 0, (n, tile)
    w = table.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((tile, w), lambda i, idx_ref: (i, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, tile=tile, depth=depth),
        out_shape=jax.ShapeDtypeStruct((n, w), table.dtype),
        grid_spec=grid_spec,
    )(idx, table)
