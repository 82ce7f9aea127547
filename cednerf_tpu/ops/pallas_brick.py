"""Pallas TPU kernels for brick-grid gather + gradient accumulation.

XLA's row gather tops out around ~160M rows/s on v5e (per-row descriptor
overhead) and its scatter-add near ~55M rows/s — both leave most of HBM
bandwidth unused for 512-byte brick rows. These kernels instead keep a
level's whole brick table resident in VMEM (2-8 MB at the default sizing)
and do the per-sample random access on-chip:

  * `brick_gather`: out[i, :] = table[idx[i], :] — the table block has a
    constant index map, so Mosaic keeps it in VMEM across the sample-tile
    grid; each row is one sublane-granular dynamic load.
  * `brick_scatter_add`: grad[idx[i], :] += upd[i, :] — the accumulator
    block also persists across grid steps (sequential TPU grid => no
    atomics needed, unlike the reference's Taichi atomic adds,
    hash_encoder_half.py:223).

Both fall back to the XLA lowering when the table exceeds the VMEM budget
(e.g. log2_hashmap_size > 21) — callers don't need to care.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Conservative per-kernel VMEM budget (bytes) for the resident table.
VMEM_TABLE_BUDGET = 10 * 1024 * 1024
_TILE = 1024  # samples per grid step


def _default_interpret() -> bool:
    """Pallas TPU kernels run interpreted on CPU (tests / virtual meshes)."""
    return jax.default_backend() == "cpu"


def _gather_kernel(idx_ref, table_ref, out_ref):
    def body(i, _):
        out_ref[i, :] = table_ref[idx_ref[i], :]
        return 0

    jax.lax.fori_loop(0, idx_ref.shape[0], body, 0, unroll=8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _brick_gather_pallas(table, idx, interpret: bool = False):
    n = idx.shape[0]
    rows, width = table.shape
    pad = (-n) % _TILE
    idx_p = jnp.pad(idx, (0, pad))
    grid = (idx_p.shape[0] // _TILE,)
    out = pl.pallas_call(
        _gather_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, width), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((idx_p.shape[0], width), table.dtype),
        interpret=interpret,
    )(idx_p, table)
    return out[:n]


def _scatter_kernel(idx_ref, upd_ref, out_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    def body(i, _):
        row = idx_ref[i]
        out_ref[row, :] += upd_ref[i, :].astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, idx_ref.shape[0], body, 0, unroll=8)


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def _brick_scatter_add_pallas(idx, upd, rows: int, interpret: bool = False):
    n, width = upd.shape
    pad = (-n) % _TILE
    # padding rows are directed to row `rows` (one scratch row, sliced off)
    idx_p = jnp.pad(idx, (0, pad), constant_values=rows)
    upd_p = jnp.pad(upd, ((0, pad), (0, 0)))
    grid = (idx_p.shape[0] // _TILE,)
    out = pl.pallas_call(
        _scatter_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((_TILE, width), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows + 1, width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows + 1, width), jnp.float32),
        interpret=interpret,
    )(idx_p, upd_p)
    return out[:rows]


def _fits_vmem(rows: int, width: int, itemsize: int) -> bool:
    return rows * width * itemsize <= VMEM_TABLE_BUDGET


@functools.lru_cache(maxsize=None)
def _make_brick_gather(rows: int, width: int, dtype_name: str):
    dtype = jnp.dtype(dtype_name)

    def impl(table, idx):
        if _fits_vmem(rows, width, dtype.itemsize):
            return _brick_gather_pallas(table, idx,
                                        interpret=_default_interpret())
        return jnp.take(table, idx, axis=0)

    @jax.custom_vjp
    def gather(table, idx):
        return impl(table, idx)

    def fwd(table, idx):
        return impl(table, idx), idx

    def bwd(idx, g):
        if _fits_vmem(rows + 1, width, 4):
            grad = _brick_scatter_add_pallas(idx, g.astype(jnp.float32), rows,
                                             interpret=_default_interpret())
        else:
            grad = jnp.zeros((rows, width), jnp.float32).at[idx].add(
                g.astype(jnp.float32))
        return grad.astype(dtype), None

    gather.defvjp(fwd, bwd)
    return gather


def brick_gather(table, idx):
    """table [R, W] x idx [N] -> [N, W] with a VMEM-resident-table kernel.

    Differentiable w.r.t. table (scatter-add backward, also in Pallas);
    transparently falls back to XLA gather/scatter for oversized tables.
    """
    rows, width = table.shape
    return _make_brick_gather(int(rows), int(width), table.dtype.name)(table, idx)
