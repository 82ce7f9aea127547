"""Pallas stream compaction for the budgeted renderer's candidate select.

`engine/renderer.py::compact_select` builds the budget selection with a
full-lattice cumsum + a scatter of unique indices — ~10 ms of the 94 ms
step at the 262k budget (ROADMAP r2 trace: "sel build"), all of it
lattice-proportional 1-D XLA ops with ~3.2 ms fixed floors.

This kernel does the same select in ONE sequential pass over sample tiles
with no per-element stores:

  * the tile's exclusive prefix ranks come from one [1,T] x [T,T]
    lower-triangular ones matmul (MXU; the triangle is a constant input
    block, fetched into VMEM once);
  * the compacted tile is built by a data-dependent one-hot permutation
    matmul (onehot[out, in] = (rank[in] == out & valid[in]), compare-built
    from a 2-D iota against the [1,T] rank row — no transposes);
  * the tile is written to the output at the running base offset with a
    single dynamic-slice store; the running base lives in SMEM scratch
    across the sequential grid.

Bit-compatible with compact_select's (sel, kept) for n_blocks == 1
(gated by tests/test_pallas_compact.py). Flat indices ride through the
MXU as f32 — exact for lattices < 2^24 entries (asserted).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=None)
def _build(n: int, budget: int, tile: int, interpret: bool):
    nt = n // tile

    def kernel(v_ref, tri_ref, sel_ref, kept_ref, base_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            base_ref[0] = 0
            sel_ref[:] = jnp.full_like(sel_ref, n)

        v = v_ref[...].astype(jnp.float32)                    # [1, T]
        # inclusive ranks via lower-tri ones matmul: r[j] = sum_{k<=j} v[k]
        # HIGHEST: the MXU's default f32 precision is bf16-grade, which
        # rounds integer ranks > 256 — these counts must be exact
        incl = jax.lax.dot_general(
            v, tri_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)              # [1, T]
        excl = incl - v                                       # [1, T]
        cnt = incl[0, tile - 1].astype(jnp.int32)

        base = base_ref[0]
        dest = base + excl[0, :].astype(jnp.int32)            # [T]
        kept_ref[...] = (v_ref[...] != 0) & (dest < budget)[None, :]

        # one-hot permutation: out_row t gets the t-th valid entry's LOCAL
        # index (iota in i32 then cast — tpu.iota cannot produce float
        # vectors; local 0..tile-1 stays f32-exact at any lattice size,
        # the i*tile flat offset is added back in int32)
        out_iota = jax.lax.broadcasted_iota(
            jnp.int32, (tile, tile), 0).astype(jnp.float32)
        onehot = ((out_iota == excl) * v)                     # [T(out), T(in)]
        idx_col = jax.lax.broadcasted_iota(
            jnp.int32, (tile, 1), 0).astype(jnp.float32)      # [T, 1]
        comp = jax.lax.dot_general(
            onehot, idx_col, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)              # [T, 1]
        row = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
        comp_i = jnp.where(row < cnt,
                           comp.astype(jnp.int32) + jnp.int32(i) * tile,
                           jnp.int32(n))                      # [T, 1]
        start = jnp.minimum(base, budget)
        sel_ref[pl.ds(start, tile), :] = comp_i
        base_ref[0] = base + cnt

    def run(valid_flat):
        tri = jnp.asarray(
            np.tril(np.ones((tile, tile), np.float32)).T)     # [k, j] k<=j
        sel_pad, kept2d = pl.pallas_call(
            kernel,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((1, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, tile), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((budget + tile, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((budget + tile, 1), jnp.int32),
                jax.ShapeDtypeStruct((1, n), bool),
            ),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
            interpret=interpret,
        )(valid_flat.reshape(1, n), tri)
        return sel_pad[:budget, 0], kept2d.reshape(n)

    return run


def compact_select_pallas(valid, budget: int, tile: int = 0,
                          interpret=None):
    """Pallas counterpart of renderer.compact_select (n_blocks == 1).

    valid: [R, M] bool. Returns (sel [budget] i32 ascending with `n`
    sentinels, kept [R, M] bool). No `rank` output — the packed render
    path does not use it.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r, m = valid.shape
    n = r * m
    if not tile:  # largest clean tile; smaller tiles shrink the T^2 work
        tile = next((t for t in (1024, 512, 256, 128, 64, 8)
                     if n % t == 0), 0)
        if not tile:
            raise ValueError(
                f"lattice size {n} has no clean tile; caller should fall "
                "back to compact_select (renderer._compact_sel_kept does)")
    assert n % tile == 0, (n, tile)
    assert n < (1 << 24), "flat indices ride the MXU as f32"
    run = _build(n, budget, tile, bool(interpret))
    sel, kept = run(valid.reshape(-1))
    return sel, kept.reshape(r, m)
