"""Pallas VMEM-accumulator scatter-add for encoder table gradients.

The encoder backward's dominant cost on v5e is XLA's scatter-add of
per-sample update rows into the (small, VMEM-sized) level tables:
~2.7-4.4 ms per [262k, 256-lane] scatter, per-row overhead-bound at
~150 M rows/s regardless of table size or collisions (ROADMAP round-2
scatter experiments). Eight levels -> ~30 ms of a ~94 ms step.

This kernel keeps the WHOLE gradient accumulator resident in VMEM across a
sequential sample-tile grid and performs the read-modify-write per row as a
VMEM dynamic-index accumulate — no HBM round trip per row. The accumulator
is written back to HBM exactly once, on the last grid step. This is the
TPU-native analogue of tcnn's shared-memory gradient accumulation
(reference spec: the Taichi backward's atomic `+=` table scatters,
hash_encoder_half.py:164-227) — collisions cost nothing because the loop
is sequential per core.

`scatter_add_onehot` is the MXU alternative for SMALL dense tables
(n_rows up to ~1-2k): express the scatter as acc += onehot(rows)^T @ upd
per sample block inside a lax.scan — O(N * n_rows * W) FLOPs, which beats
the per-row scatter overhead only when n_rows is tiny.

Both are bit-compatible with `jnp.zeros(...).at[rows].add(upd)` (gated by
tests/test_pallas_scatter.py, interpret mode on CPU).

SILICON VERDICT (v5e, 2026-08-19, tools/profile_pallas_scatter.py +
profile_budget.py): standalone the VMEM accumulator wins (2.33-2.42 ms
per 262k x 256-lane rows at any table size vs XLA .at[].add 2.5-4.0 ms
— per-row cost is a ~9 ns wall for every impl). IN-PROGRAM it loses
(105.6 vs 94.3 ms step at the 262k budget): XLA fuses the update-row
lane math into its scatter, while a pallas_call boundary forces the
[N, 256] rows through HBM. Kept as an option + the building block for
fused backward kernels (which avoid the boundary by also owning the
lane math); scatter_impl default stays "xla".
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic cannot lower a VMEM vector load/store at an arbitrary dynamic row
# offset ("cannot statically prove that index in dimension 0 is a multiple
# of 8", v5e 2026-08): dynamic sublane offsets must be provably aligned.
# All dynamic row access below therefore moves ALIGN-row windows at
# provably-aligned bases with a one-hot row select inside the window.
ALIGN = 8


def accum_rows_aligned(acc_ref, rows_ref, upd_ref, tile: int,
                       cast_dtype=None):
    """In-kernel `acc_ref[rows[i]] += upd[i]` for i in [0, tile), Mosaic-safe.

    acc_ref: [n_rows, W] VMEM accumulator (n_rows % ALIGN == 0);
    rows_ref: [tile] SMEM int32; upd_ref: [tile, W] VMEM.
    Sample order (and thus float addition order) matches a sequential
    per-row loop: each i applies exactly one masked add.
    """
    w = upd_ref.shape[-1]
    adt = acc_ref.dtype if cast_dtype is None else cast_dtype
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (ALIGN, w), 0)
    # rows may arrive as [tile] or group-major [tile//ALIGN, ALIGN] (2-D when
    # the tile is below XLA's 1024-element 1-D layout granule, whose block
    # shape Mosaic's (8, 128)-divisibility check rejects)
    read_row = (lambda j, u: rows_ref[j, u]) if rows_ref.ndim == 2 \
        else (lambda j, u: rows_ref[j * ALIGN + u])

    def body(j, _):
        g = pl.multiple_of(j * ALIGN, ALIGN)
        upd_w = upd_ref[pl.ds(g, ALIGN), :].astype(adt)
        for u in range(ALIGN):
            r = read_row(j, u)
            rb = pl.multiple_of((r // ALIGN) * ALIGN, ALIGN)
            sel = (row_iota == (r - rb)).astype(adt)
            acc_ref[pl.ds(rb, ALIGN), :] += sel * upd_w[u:u + 1, :]
        return 0

    jax.lax.fori_loop(0, tile // ALIGN, body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("n_rows", "accum_dtype", "tile", "unroll", "interpret"),
)
def scatter_add_rows(rows, upd, *, n_rows: int, accum_dtype=jnp.float32,
                     tile: int = 2048, unroll: int = 8,
                     interpret: bool = None):
    """VMEM-resident scatter-add: acc[rows[i]] += upd[i].

    rows: [N] int32 in [0, n_rows); upd: [N, W]. Returns [n_rows, W] in
    accum_dtype. VMEM must hold n_rows * W * itemsize(accum_dtype) plus two
    [tile, W] input buffers — at W=256 lanes that is 16384 rows in bf16 or
    8192 rows in f32 (~8 MB), within a v5e core's ~16 MB budget.

    interpret=None compiles on TPU and interprets elsewhere (CPU test mesh).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    del unroll  # superseded by the aligned-window accumulate
    n, w = upd.shape
    assert n % tile == 0, (n, tile)
    # pad the accumulator to the window granule (dense levels have e.g.
    # 17^3 = 4913 rows); padding rows are never indexed and sliced away
    n_rows_pad = -(-n_rows // ALIGN) * ALIGN
    adt = jnp.dtype(accum_dtype)

    def kernel(rows_ref, upd_ref, out_ref):
        # accumulate directly in the VMEM-resident output block (constant
        # index map) — a separate scratch accumulator doubles the table's
        # VMEM footprint and OOMs the 16 MB budget at 16384x256 rows
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        accum_rows_aligned(out_ref, rows_ref, upd_ref, tile)

    return pl.pallas_call(
        kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_rows_pad, w), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows_pad, w), adt),
        interpret=interpret,
    )(rows.astype(jnp.int32), upd)[:n_rows]


def scatter_add_onehot(rows, upd, *, n_rows: int, accum_dtype=jnp.float32,
                       block: int = 8192):
    """MXU scatter-add for small tables: acc += onehot(rows)^T @ upd.

    O(N * n_rows * W) FLOPs — only sensible for n_rows up to ~1-2k, where
    it is effectively free next to a per-row scatter's fixed overhead
    (262k x 1000 x 256 x 2 = 134 GFLOP ~ 0.7 ms at v5e bf16 peak).
    """
    n, w = upd.shape
    assert n % block == 0, (n, block)
    adt = jnp.dtype(accum_dtype)
    rid = jnp.arange(n_rows, dtype=jnp.int32)
    rows_b = rows.astype(jnp.int32).reshape(-1, block)
    upd_b = upd.reshape(-1, block, w)

    def step(acc, xs):
        rb, ub = xs
        onehot = (rb[:, None] == rid[None, :]).astype(ub.dtype)  # [B, R]
        acc = acc + jax.lax.dot_general(
            onehot, ub, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(adt)
        return acc, None

    acc0 = jnp.zeros((n_rows, w), adt)
    acc, _ = jax.lax.scan(step, acc0, (rows_b, upd_b))
    return acc
