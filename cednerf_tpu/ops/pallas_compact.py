"""Pallas stream compaction for the budgeted renderer's candidate select.

`engine/renderer.py::compact_select` builds the budget selection with a
full-lattice cumsum + a scatter of unique indices — ~10 ms of the 94 ms
step at the 262k budget (ROADMAP r2 trace: "sel build"), all of it
lattice-proportional 1-D XLA ops with ~3.2 ms fixed floors.

This kernel does the same select in ONE sequential pass over sample tiles:

  * the tile's exclusive prefix ranks come from one [1,T] x [T,T]
    lower-triangular ones matmul (MXU; the triangle is a constant input
    block, fetched into VMEM once);
  * the compacted tile is built lane-major by a data-dependent one-hot
    permutation matmul (onehotT[in, out] = (rank[in] == out & valid[in]));
    the [1,T] -> [T,1] relayouts ride the MXU as identity matmuls;
  * the tile is placed at the running base offset into a lane-major
    [rows, T] output grid: an MXU shift matmul rotates the row by
    (start % T) and two aligned-8-row masked merges write the (at most
    two) destination rows. The running base lives in SMEM scratch.

The output grid is [budget/T + 2, T] int32 — ~1 MB per 262k budget slots —
instead of a flat [budget, 1] block, whose 128x lane padding exceeds the
128 MiB VMEM at budgets >= 262k (the r1 kernel only ever compiled at the
65k eval budget).

Mosaic constraints honored (all silicon-verified in this file's siblings):
integer-exact MXU via Precision.HIGHEST, int iota + cast, aligned-window
dynamic row access only.

Bit-compatible with compact_select's (sel, kept) for n_blocks == 1
(gated by tests/test_pallas_compact.py). Local indices ride the MXU as
f32 — exact (< T); the i*T flat offset is added back in int32.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HI = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=None)
def _build(n: int, budget: int, tile: int, interpret: bool):
    nt = n // tile
    out_rows = -(-budget // tile) + 2
    out_rows_pad = -(-out_rows // 8) * 8

    def kernel(v_ref, tri_ref, eye_ref, sel_ref, kept_ref, base_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            base_ref[0] = 0
            sel_ref[:] = jnp.full_like(sel_ref, n)

        v = v_ref[...].astype(jnp.float32)                    # [1, T]
        eye = eye_ref[...]
        # inclusive ranks via lower-tri ones matmul: r[j] = sum_{k<=j} v[k]
        # HIGHEST: the MXU's default f32 precision is bf16-grade, which
        # rounds integer ranks > 256 — these counts must be exact
        incl = jax.lax.dot_general(
            v, tri_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)  # [1, T]
        excl = incl - v                                       # [1, T]
        cnt = incl[0, tile - 1].astype(jnp.int32)

        base = base_ref[0]
        dest = base + excl[0, :].astype(jnp.int32)            # [T]
        kept_ref[...] = (v_ref[...] != 0) & (dest < budget)[None, :]

        # lane-major permutation: comp_row[0, out] = local idx of the valid
        # entry with rank `out`. The [1,T] -> [T,1] relayouts are identity
        # matmuls (dot contracting both lane dims) — no tpu transposes.
        excl_col = jax.lax.dot_general(
            eye, excl, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)  # [T, 1]
        v_col = jax.lax.dot_general(
            eye, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)  # [T, 1]
        lane_f = jax.lax.broadcasted_iota(
            jnp.int32, (tile, tile), 1).astype(jnp.float32)
        onehot_t = (excl_col == lane_f).astype(jnp.float32) * v_col
        idx_row = jax.lax.broadcasted_iota(
            jnp.int32, (1, tile), 1).astype(jnp.float32)      # [1, T]
        comp = jax.lax.dot_general(
            idx_row, onehot_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)  # [1, T]
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        comp_i = jnp.where(lane_i < cnt,
                           comp.astype(jnp.int32) + jnp.int32(i) * tile,
                           jnp.int32(n))                      # [1, T]

        # place entries at flat [start, start+cnt): rotate the row by
        # off = start % T via an MXU shift matmul (shift[in, out] =
        # (out == (in + off) mod T)), then masked-merge into the (at most
        # two) destination rows of the lane-major output grid
        start = jnp.minimum(base, budget)
        r0 = start // tile
        off = start - r0 * tile
        sub_i = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
        lane_ii = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
        shift = (((lane_ii - sub_i - off) % tile) == 0
                 ).astype(jnp.float32)                        # [in, out]
        rolled = jax.lax.dot_general(
            comp_i.astype(jnp.float32), shift, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI)
        # sentinel lanes (rank >= cnt) map to n > 2^? — n < 2^24 asserted,
        # f32-exact through the matmul
        rolled_i = rolled.astype(jnp.int32)                   # [1, T]
        win_iota = jax.lax.broadcasted_iota(jnp.int32, (8, tile), 0)
        valid_lane = rolled_i != jnp.int32(n)                 # [1, T]
        rolled_b = jnp.broadcast_to(rolled_i, (8, tile))
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, tile), 1)
        for which in (0, 1):
            r = r0 + which
            wb = pl.multiple_of((r // 8) * 8, 8)
            seg_mask = (lane8 >= off) if which == 0 else (lane8 < off)
            m = ((win_iota == (r - wb)) & seg_mask
                 & jnp.broadcast_to(valid_lane, (8, tile)))
            win = sel_ref[pl.ds(wb, 8), :]
            sel_ref[pl.ds(wb, 8), :] = jnp.where(m, rolled_b, win)

        base_ref[0] = base + cnt

    def run(valid_flat):
        tri = jnp.asarray(
            np.tril(np.ones((tile, tile), np.float32)).T)     # [k, j] k<=j
        eye = jnp.asarray(np.eye(tile, dtype=np.float32))
        sel2d, kept2d = pl.pallas_call(
            kernel,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((1, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, tile), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, tile), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((out_rows_pad, tile), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((out_rows_pad, tile), jnp.int32),
                jax.ShapeDtypeStruct((1, n), bool),
            ),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
            interpret=interpret,
        )(valid_flat.reshape(1, n), tri, eye)
        return sel2d.reshape(-1)[:budget], kept2d.reshape(n)

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
