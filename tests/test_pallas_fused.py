"""Parity tests for the round-3 fused (DMA-gather + interp) encoder kernel.

The fused kernel must bit-match the shipped two-stage path (XLA gather ->
pallas interp_fwd), which is itself tested against the XLA brick encode
(test_pallas_encoder.py). Runs in interpret mode on the CPU test mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cednerf_tpu.ops import brick_grid as bg
from cednerf_tpu.ops.pallas_encoder import interp_fwd
from cednerf_tpu.ops.pallas_fused import fused_encode_fwd


def _level_setup(key, n, levels, n_feat, base_res=16, max_res=256,
                 hashed_rows=512):
    import math
    log_b = (math.log(max_res / base_res) / (levels - 1)) if levels > 1 else 0.0
    scales, nbs, tables, rows_l = [], [], [], []
    x = jax.random.uniform(jax.random.fold_in(key, 99), (n, 3))
    for lvl in range(levels):
        scale = bg.level_scale(lvl, log_b, base_res)
        nb = max(1, int(np.ceil((np.ceil(scale) + 1) / bg.BRICK_CELLS)))
        hashed = lvl >= levels // 2
        n_rows = hashed_rows if hashed else nb ** 3
        rows, _, _, _ = bg._level_geom(x, scale, nb, hashed, n_rows)
        table = jax.random.normal(
            jax.random.fold_in(key, lvl), (n_rows, 64 * n_feat),
            jnp.float32)
        scales.append(float(scale))
        nbs.append(nb)
        tables.append(table)
        rows_l.append(rows)
    return x, scales, nbs, tables, jnp.stack(rows_l, axis=0)


@pytest.mark.parametrize("n_feat", [4])  # dma128: 32F == 128-lane DMA rows
def test_fused_fwd_matches_gather_interp(n_feat):
    key = jax.random.PRNGKey(0)
    n, levels = 1024, 4
    x, scales, nbs, tables, rows = _level_setup(key, n, levels, n_feat)

    got = fused_encode_fwd(x, tables, rows, scales, nbs, n_feat,
                           tile=256, depth=4, interpret=True)

    feats = [jnp.take(tables[l], rows[l], axis=0).astype(jnp.bfloat16)
             for l in range(levels)]
    want = interp_fwd(x, feats, scales, nbs, n_feat, tile=256,
                      interpret=True)
    # both paths share the identical f32->bf16 cast chain and lane math,
    # so interpret-mode outputs must be bit-equal
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_dma_tile_stays_inside_grid_envelope():
    """Tile auto-scaling keeps n/tile <= the k9 remote-compile crash bound."""
    from cednerf_tpu.ops.pallas_fused import MAX_PROGRAMS, dma_tile
    assert dma_tile(2 ** 20, 256) == 512      # the bench budget at bwd base
    assert dma_tile(2 ** 20, 512) == 512
    assert dma_tile(2 ** 21, 512) == 1024     # 2M budget scales again
    assert dma_tile(1024, 512) == 512
    assert dma_tile(1000, 512) is None        # not tile-divisible
    for n in (2 ** 18, 2 ** 20, 2 ** 22):
        t = dma_tile(n, 256)
        assert n % t == 0 and n // t <= MAX_PROGRAMS


@pytest.mark.parametrize("n_feat", [4])
def test_fused_bwd_matches_interp_bwd_fused(n_feat):
    """DMA backward == round-1 fused backward (same math, no feats operand)."""
    from cednerf_tpu.ops.pallas_encoder import interp_bwd_fused
    from cednerf_tpu.ops.pallas_fused import fused_encode_bwd

    key = jax.random.PRNGKey(2)
    n, levels = 1024, 3
    x, scales, nbs, tables, rows = _level_setup(key, n, levels, n_feat)
    g = jax.random.normal(jax.random.fold_in(key, 7), (n, n_feat),
                          jnp.float32)
    for lvl in range(levels):
        feats = jnp.take(tables[lvl].astype(jnp.bfloat16), rows[lvl], axis=0)
        want_dt, want_dx = interp_bwd_fused(
            x, g, feats, rows[lvl], scale=scales[lvl], nb=nbs[lvl],
            n_rows=tables[lvl].shape[0], n_feat=n_feat, tile=256,
            interpret=True)
        got_dt, got_dx = fused_encode_bwd(
            x, g, rows[lvl], tables[lvl], scale=scales[lvl], nb=nbs[lvl],
            n_rows=tables[lvl].shape[0], n_feat=n_feat, tile=256, depth=4,
            interpret=True)
        np.testing.assert_allclose(np.asarray(got_dx), np.asarray(want_dx),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(got_dt, np.float32),
                                   np.asarray(want_dt, np.float32),
                                   rtol=1e-3, atol=1e-3)


def test_fused_fwd_f32_exact_vs_reference_sum():
    """f32 compute path vs a direct per-corner einsum reference.

    Tables are bf16-valued (the dma128 view stores bf16 bytes) so the f32
    interp math is the only source of rounding on both sides."""
    key = jax.random.PRNGKey(1)
    n, levels, n_feat = 512, 2, 4
    x, scales, nbs, tables, rows = _level_setup(key, n, levels, n_feat,
                                                hashed_rows=128)
    tables = [t.astype(jnp.bfloat16).astype(jnp.float32) for t in tables]
    got = fused_encode_fwd(x, tables, rows, scales, nbs, n_feat,
                           compute_dtype=jnp.float32,
                           out_dtype=jnp.float32, tile=256, depth=2,
                           interpret=True)
    for lvl in range(levels):
        feats = np.asarray(tables[lvl])[np.asarray(rows[lvl])]  # [N, 64F]
        _, intra, frac, _ = bg._level_geom(x, scales[lvl], nbs[lvl],
                                           lvl >= 1, tables[lvl].shape[0])
        intra, frac = np.asarray(intra), np.asarray(frac)
        w = np.zeros((n, 64))
        for dx in range(2):
            for dy in range(2):
                for dz in range(2):
                    corner = ((intra[:, 0] + dx) * 16 + (intra[:, 1] + dy) * 4
                              + (intra[:, 2] + dz))
                    wc = (np.where(dx, frac[:, 0], 1 - frac[:, 0])
                          * np.where(dy, frac[:, 1], 1 - frac[:, 1])
                          * np.where(dz, frac[:, 2], 1 - frac[:, 2]))
                    w[np.arange(n), corner] += wc
        want = np.einsum("nc,ncf->nf", w,
                         feats.reshape(n, 64, n_feat))
        np.testing.assert_allclose(
            np.asarray(got[:, lvl * n_feat:(lvl + 1) * n_feat]), want,
            rtol=1e-4, atol=1e-4)
