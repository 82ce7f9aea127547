"""Segmented reductions/broadcasts over packed ray-major sample buffers.

The packed train path (engine/renderer.py render_packed) lays a batch's
samples out as contiguous per-ray segments [starts, starts+counts) of a
fixed [budget] buffer. Mapping per-ray values to slots (and reducing
per-slot values to rays) with `jnp.take(vals, ray)` / `.at[ray].add()`
pays the v5e per-row gather/scatter wall (~9 ns/row: 9.8 ms fwd + 11.5 ms
bwd per 1M-slot instance, tools/profile_layouts.py). These helpers do the
same jobs with one cumsum plus R-sized boundary gathers/scatters
(~2.5 ms at 1M), which is also the formulation whose autodiff is cheap:
cumsum backward is a reversed cumsum, and the boundary gathers scatter
only [R]-sized rows.

Replaces the per-ray reduce/broadcast role of nerfacc's CUDA
`accumulate_along_rays` / packed-segment indexing
(/root/reference/cednerf/render.py:8-39, :158-169) on the packed buffer.
"""

import jax.numpy as jnp


def segment_sum(per_slot, starts, counts, budget: int):
    """Per-ray sums of a packed per-slot array: [B(,C)] -> [R(,C)].

    One global (inclusive, zero-padded) cumsum + two boundary gathers.
    Block padding between compaction blocks must carry zeros (it does:
    callers zero invalid slots), so a single global cumsum is exact for
    any n_blocks. Slots outside every segment never contribute.

    f32 accumulation: the global running total reaches ~1e4, so boundary
    differences keep ~1e-3 absolute accuracy — the same contract as
    render_packed's channel cumsums.
    """
    squeeze = per_slot.ndim == 1
    x = per_slot[:, None] if squeeze else per_slot
    c = x.shape[-1]
    z = jnp.cumsum(x.astype(jnp.float32), axis=0)
    zp = jnp.concatenate([jnp.zeros((1, c), jnp.float32), z], axis=0)
    lo = jnp.take(zp, starts, axis=0)
    hi = jnp.take(zp, jnp.minimum(starts + counts, budget), axis=0)
    out = hi - lo
    return out[:, 0] if squeeze else out


def segment_broadcast(vals, starts, budget: int, n_blocks: int = 1):
    """Broadcast per-ray rows to their packed slots: [R(,C)] -> [B(,C)].

    Scatters first-difference rows at segment starts and integrates with a
    per-block cumsum. Within a block, every slot at or after a ray's start
    (until the next ray's start) carries that ray's row — including the
    block's invalid tail slots, which callers mask. Slots before a block's
    first start never occur (_block_starts gives the first ray local
    start 0).

    Overflow-clamped starts (a suffix of a block, by monotonicity) land on
    a per-block spill row that is sliced off before the cumsum, so they
    cannot corrupt the next block. Reconstruction is exact up to f32
    re-association across one block's telescoping sum (~1e-5 relative for
    unit-scale inputs at R ~ 1e4).
    """
    squeeze = vals.ndim == 1
    v = vals[:, None] if squeeze else vals
    r, c = v.shape
    rb = r // n_blocks
    bb = budget // n_blocks
    vb = v.reshape(n_blocks, rb, c)
    prev = jnp.concatenate(
        [jnp.zeros((n_blocks, 1, c), v.dtype), vb[:, :-1]], axis=1)
    delta = (vb - prev).reshape(r, c)
    blk = jnp.arange(r, dtype=jnp.int32) // rb
    local = jnp.clip(starts - blk * bb, 0, bb)  # bb == per-block spill row
    idx = blk * (bb + 1) + local
    buf = jnp.zeros((n_blocks * (bb + 1), c), v.dtype).at[idx].add(
        delta, indices_are_sorted=True)
    out = jnp.cumsum(buf.reshape(n_blocks, bb + 1, c)[:, :bb], axis=1)
    out = out.reshape(budget, c)
    return out[:, 0] if squeeze else out
