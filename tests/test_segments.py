"""ops/segments.py: segment_sum / segment_broadcast vs take/scatter refs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cednerf_tpu.ops.segments import segment_broadcast, segment_sum


def _layout(rng, r, budget, n_blocks, overflow=False):
    """Random per-ray counts -> per-block starts (renderer _block_starts).

    Kept counts are truncated at each ray's OWN block's end (the
    production compaction never lets a block's segments spill into the
    next block; an overflowed start is clamped and its ray keeps zero
    samples), so segments never overlap.
    """
    rb = r // n_blocks
    bb = budget // n_blocks
    hi = (3 * bb) // rb + 3 if overflow else max(bb // rb, 1)
    counts = rng.integers(0, hi + 1, size=r).astype(np.int32)
    cb = counts.reshape(n_blocks, rb)
    starts = (np.cumsum(cb, axis=-1) - cb
              + (np.arange(n_blocks) * bb)[:, None]).reshape(-1)
    starts = np.minimum(starts, budget).astype(np.int32)
    blk = np.arange(r) // rb
    block_end = (blk + 1) * bb
    ends = np.minimum(starts + counts, block_end)
    kept = np.maximum(ends - np.minimum(starts, ends), 0).astype(np.int32)
    ray = np.full(budget, -1, np.int32)
    for i in range(r):
        ray[starts[i]:starts[i] + kept[i]] = i
    if overflow:
        assert (counts.reshape(n_blocks, -1).sum(-1) > bb).any(), \
            "overflow fixture failed to overflow"
    return jnp.asarray(starts), jnp.asarray(kept), ray


@pytest.mark.parametrize("n_blocks,overflow", [(1, False), (1, True),
                                               (2, False), (2, True)])
def test_segment_sum_matches_scatter_add(n_blocks, overflow):
    rng = np.random.default_rng(3)
    r, budget = 24, 96
    starts, kept, ray = _layout(rng, r, budget, n_blocks, overflow)
    x = rng.normal(size=(budget, 3)).astype(np.float32)
    x[ray < 0] = 0.0  # invalid slots are zeroed by callers
    ref = np.zeros((r, 3), np.float32)
    np.add.at(ref, ray[ray >= 0], x[ray >= 0])
    got = segment_sum(jnp.asarray(x), starts, kept, budget)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5, atol=1e-5)
    # 1-D form
    got1 = segment_sum(jnp.asarray(x[:, 0]), starts, kept, budget)
    np.testing.assert_allclose(np.asarray(got1), ref[:, 0], rtol=1e-5,
                               atol=1e-5)


@pytest.mark.parametrize("n_blocks,overflow", [(1, False), (1, True),
                                               (2, False), (2, True)])
def test_segment_broadcast_matches_take(n_blocks, overflow):
    rng = np.random.default_rng(5)
    r, budget = 24, 96
    starts, kept, ray = _layout(rng, r, budget, n_blocks, overflow)
    vals = rng.normal(size=(r, 4)).astype(np.float32)
    got = np.asarray(segment_broadcast(jnp.asarray(vals), starts, budget,
                                       n_blocks))
    # compare on slots inside real segments only (tail slots are masked by
    # callers; overflowed rays' slots don't exist)
    m = ray >= 0
    np.testing.assert_allclose(got[m], vals[ray[m]], rtol=1e-5, atol=1e-5)
    got1 = np.asarray(segment_broadcast(jnp.asarray(vals[:, 0]), starts,
                                        budget, n_blocks))
    np.testing.assert_allclose(got1[m], vals[ray[m], 0], rtol=1e-5,
                               atol=1e-5)


def test_segment_broadcast_grad_matches_take_grad():
    """d/dvals of sum(f(broadcast)) == segment-region scatter of f' — and
    must equal the take-by-ray formulation's gradient on masked objectives."""
    rng = np.random.default_rng(7)
    r, budget, n_blocks = 12, 64, 2
    starts, kept, ray = _layout(rng, r, budget, n_blocks)
    vals = jnp.asarray(rng.normal(size=(r,)).astype(np.float32))
    w = jnp.asarray((ray >= 0).astype(np.float32)
                    * rng.random(budget).astype(np.float32))
    ray_c = jnp.asarray(np.maximum(ray, 0))

    def via_bcast(v):
        return jnp.sum(w * jnp.sin(segment_broadcast(v, starts, budget,
                                                     n_blocks)))

    def via_take(v):
        return jnp.sum(w * jnp.sin(jnp.take(v, ray_c)))

    g_b = jax.grad(via_bcast)(vals)
    g_t = jax.grad(via_take)(vals)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_t), rtol=1e-4,
                               atol=1e-5)


def test_segment_sum_is_linear_grad():
    rng = np.random.default_rng(9)
    r, budget = 8, 32
    starts, kept, ray = _layout(rng, r, budget, 1)
    rw = jnp.asarray(rng.random(r).astype(np.float32))

    def f(x):
        return jnp.sum(segment_sum(x, starts, kept, budget) * rw)

    x = jnp.asarray(rng.normal(size=(budget,)).astype(np.float32))
    g = np.asarray(jax.grad(f)(x))
    # gradient of a segment sum: rw broadcast over the segment, 0 outside
    expect = np.zeros(budget, np.float32)
    m = ray >= 0
    expect[m] = np.asarray(rw)[ray[m]]
    np.testing.assert_allclose(g, expect, rtol=1e-5, atol=1e-6)


def test_packed_distortion_loss_accurate_at_production_scale():
    """f32 accuracy guard: the packed distortion loss must keep per-slot
    terms O(1) (pre-subtracted prefixes). The algebraically-equivalent
    fully-expanded segment-sum form cancels catastrophically at this scale
    (71% loss error measured at 262k slots) — this test pins the accurate
    formulation."""
    from cednerf_tpu.ops.losses import packed_distortion_loss

    rng = np.random.default_rng(0)
    r, s = 4096, 64
    budget = r * s
    counts = np.full(r, s, np.int32)
    starts = (np.cumsum(counts) - counts).astype(np.int32)
    dts = np.full((r, s), 0.005, np.float32)
    t0 = (np.cumsum(dts, axis=-1) - dts + rng.random((r, 1))).astype(np.float32)
    w = (rng.random((r, s)) * 0.05).astype(np.float32)

    # f64 reference: per-ray prefix form of sum_ij w_i w_j |m_i - m_j|
    w64 = w.astype(np.float64)
    mid = (t0 + 0.5 * dts).astype(np.float64)
    cw = np.cumsum(w64, axis=-1) - w64
    cwm = np.cumsum(w64 * mid, axis=-1) - w64 * mid
    per_ray = (2.0 * (w64 * (mid * cw - cwm)).sum(-1)
               + (w64 ** 2 * dts).sum(-1) / 3.0)
    ref = per_ray.mean()

    got = float(packed_distortion_loss(
        jnp.asarray(w.reshape(-1)), jnp.asarray(t0.reshape(-1)),
        jnp.asarray(dts.reshape(-1)), jnp.asarray(starts),
        jnp.asarray(counts), budget, None))
    assert abs(got - ref) / ref < 2e-2, (got, ref)
