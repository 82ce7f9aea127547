"""Budgeted cross-ray sample compaction (engine/renderer.py compact_select +
render_rays_budget): the field is evaluated on a fixed-size buffer of the
valid marching candidates and the results scattered back to the dense
[R, M] lattice. Must match the dense path exactly when the budget holds every
valid sample, degrade by dropping trailing samples (flagging those rays
incomplete) when not, and keep gradients identical to the dense path."""

import numpy as np
import jax
import jax.numpy as jnp
import jax.random as jr
import pytest

from cednerf_tpu.engine.renderer import (compact_select, render_rays,
                                         render_rays_budget)
from cednerf_tpu.models.field import DNGPRadianceField
from cednerf_tpu.ops.occupancy import RayCandidates, RaySamples


def _setup(seed=0, r=8, m=16):
    field = DNGPRadianceField(
        aabb=(-1.5,) * 3 + (1.5,) * 3, n_levels=3, dst_resolution=32,
        base_resolution=8, log2_hashmap_size=10, use_feat_predict=True,
        use_weight_predict=True,
    )
    x = jnp.zeros((4, 3))
    params = field.init(jax.random.PRNGKey(seed), x, jnp.zeros((4, 1)),
                        jnp.ones((4, 3)), return_internal=True)
    rng = np.random.default_rng(seed)
    origins = jnp.asarray(rng.normal(0, 0.1, (r, 3)), jnp.float32)
    viewdirs = jnp.asarray(rng.normal(size=(r, 3)), jnp.float32)
    viewdirs = viewdirs / jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
    dts = jnp.asarray(rng.uniform(0.01, 0.05, (r, m)), jnp.float32)
    t0 = jnp.cumsum(dts, axis=-1) - dts
    # scattered validity (NOT front-packed: candidates are an occupancy mask)
    valid = jnp.asarray(rng.random((r, m)) < 0.6)
    cand = RayCandidates(t_starts=t0, dts=dts, valid=valid)
    ts = jnp.asarray(rng.random((r, 1)), jnp.float32)
    bkgd = jnp.asarray([1.0, 1.0, 1.0])
    return field, params, origins, viewdirs, cand, ts, bkgd


def test_compact_select_roundtrip():
    rng = np.random.default_rng(3)
    valid = jnp.asarray(rng.random((8, 16)) < 0.4)
    n_valid = int(valid.sum())
    sel, kept, rank = compact_select(valid, budget=n_valid + 8)
    # every valid candidate selected exactly once, in ascending order
    sel_np = np.asarray(sel)
    real = sel_np[sel_np < 8 * 16]
    assert len(real) == n_valid
    assert (np.sort(real) == real).all()
    np.testing.assert_array_equal(np.asarray(kept), np.asarray(valid))
    expected = np.flatnonzero(np.asarray(valid).reshape(-1))
    np.testing.assert_array_equal(real, expected)
    # rank is sel's inverse on kept candidates
    rank_np = np.asarray(rank).reshape(-1)
    kept_np = np.asarray(kept).reshape(-1)
    for i in np.flatnonzero(kept_np):
        assert sel_np[rank_np[i]] == i


def test_compact_select_overflow_and_blocks():
    rng = np.random.default_rng(4)
    valid = jnp.asarray(rng.random((8, 16)) < 0.9)
    sel, kept, rank = compact_select(valid, budget=32, n_blocks=4)
    kept_np = np.asarray(kept)
    # block-adjusted rank inverts sel here too
    sel_np, rank_flat = np.asarray(sel), np.asarray(rank).reshape(-1)
    for i in np.flatnonzero(kept_np.reshape(-1)):
        assert sel_np[rank_flat[i]] == i
    # each 2-ray block keeps at most 8 samples, a flat prefix of its valids
    for b in range(4):
        block_valid = np.asarray(valid)[2 * b:2 * b + 2].reshape(-1)
        block_kept = kept_np[2 * b:2 * b + 2].reshape(-1)
        assert block_kept.sum() == min(block_valid.sum(), 8)
        first_idx = np.flatnonzero(block_valid)[:int(block_kept.sum())]
        np.testing.assert_array_equal(np.flatnonzero(block_kept), first_idx)


def test_pack_candidates_front_packs_and_flags_truncation():
    from cednerf_tpu.engine.renderer import pack_candidates

    rng = np.random.default_rng(7)
    dts = jnp.asarray(rng.uniform(0.01, 0.05, (4, 16)), jnp.float32)
    t0 = jnp.cumsum(dts, axis=-1) - dts
    valid = jnp.asarray(rng.random((4, 16)) < 0.5)
    cand = RayCandidates(t_starts=t0, dts=dts, valid=valid)
    packed, fits = pack_candidates(cand, s_cap=4)
    v = np.asarray(valid)
    counts = v.sum(-1)
    np.testing.assert_array_equal(np.asarray(fits), counts <= 4)
    for r in range(4):
        keep = min(counts[r], 4)
        idx = np.flatnonzero(v[r])[:keep]
        # first `keep` slots hold the first valid candidates, in order
        np.testing.assert_array_equal(
            np.asarray(packed.t_starts)[r, :keep], np.asarray(t0)[r, idx])
        assert np.asarray(packed.valid)[r, :keep].all()


def test_budgeted_with_pack_matches_unpacked():
    """Capped-lattice rendering must agree with the uncapped path when no
    ray is truncated (same samples, same budget)."""
    from cednerf_tpu.engine.renderer import pack_candidates

    field, params, o, d, cand, ts, bkgd = _setup(seed=5)
    n_valid = int(cand.valid.sum())
    max_count = int(jnp.max(jnp.sum(cand.valid, axis=-1)))
    packed, fits = pack_candidates(cand, s_cap=max_count)
    assert bool(jnp.all(fits))
    a = render_rays_budget(field, params, o, d, cand, ts, bkgd,
                           budget=n_valid + 8, train=True)
    b = render_rays_budget(field, params, o, d, packed, ts, bkgd,
                           budget=n_valid + 8, train=True, ray_complete=fits)
    np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.extras["complete"]),
                                  np.asarray(b.extras["complete"]))


def test_budgeted_matches_dense_when_budget_sufficient():
    field, params, o, d, cand, ts, bkgd = _setup()
    samples = RaySamples(t_starts=cand.t_starts, t_ends=cand.t_ends,
                         mask=cand.valid)
    dense = render_rays(field, params, o, d, samples, ts, bkgd, train=True)
    n_valid = int(cand.valid.sum())
    out = render_rays_budget(field, params, o, d, cand, ts, bkgd,
                             budget=n_valid + 8, train=True)
    np.testing.assert_allclose(np.asarray(out.rgb), np.asarray(dense.rgb),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(dense.depth),
                               rtol=1e-4, atol=1e-5)
    assert int(out.n_samples) == int(dense.n_samples)
    assert np.asarray(out.extras["complete"]).all()
    assert int(out.extras["n_valid"]) == n_valid
    # latent loss: budget path pre-reduces channels; total scalar must match
    np.testing.assert_allclose(
        float(jnp.mean(out.extras["latent_losses"])),
        float(jnp.mean(dense.extras["latent_losses"])), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.extras["weight_losses"]),
                               np.asarray(dense.extras["weight_losses"]),
                               rtol=1e-3, atol=1e-5)


def test_budgeted_gradients_match_dense():
    field, params, o, d, cand, ts, bkgd = _setup(seed=1)
    samples = RaySamples(t_starts=cand.t_starts, t_ends=cand.t_ends,
                         mask=cand.valid)
    target = jnp.full((8, 3), 0.5)
    n_valid = int(cand.valid.sum())

    def loss_budget(p):
        out = render_rays_budget(field, p, o, d, cand, ts, bkgd,
                                 budget=n_valid + 8, train=True)
        return (jnp.mean((out.rgb - target) ** 2)
                + jnp.mean(out.extras["latent_losses"]))

    def loss_dense(p):
        out = render_rays(field, p, o, d, samples, ts, bkgd, train=True)
        return (jnp.mean((out.rgb - target) ** 2)
                + jnp.mean(out.extras["latent_losses"]))

    g_dense = jax.grad(loss_dense)(params)
    g_comp = jax.grad(loss_budget)(params)
    # bf16 compute differs in rounding between the two batch shapes; require
    # agreement to bf16-level precision only
    for a, b in zip(jax.tree_util.tree_leaves(g_comp),
                    jax.tree_util.tree_leaves(g_dense)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-2,
                                   atol=1e-4)


def test_overflow_drops_trailing_and_flags_incomplete():
    field, params, o, d, cand, ts, bkgd = _setup(seed=2)
    n_valid = int(cand.valid.sum())
    budget = max(8, (n_valid // 2) // 8 * 8)
    out = render_rays_budget(field, params, o, d, cand, ts, bkgd,
                             budget=budget, train=True)
    assert int(out.n_samples) == budget
    complete = np.asarray(out.extras["complete"])
    counts = np.asarray(cand.valid.sum(-1))
    cum = np.cumsum(counts)
    # rays fully inside the budget are complete, later rays are not
    # (rays with no valid samples are trivially complete)
    expected = np.where((cum <= budget) | (counts == 0), 1.0, 0.0)
    # the boundary ray may be partially kept -> incomplete unless exact fit
    np.testing.assert_array_equal(complete, expected)
    assert np.isfinite(np.asarray(out.rgb)).all()
    assert int(out.extras["n_valid"]) == n_valid


def test_packed_matches_dense_outputs_and_grads():
    """render_rays_budget_packed == render_rays_budget: rgb/opacity/depth,
    complete flags, AND parameter gradients of the full loss assembly
    (incl. packed distortion/rgbper/latent/weight-predict forms)."""
    from cednerf_tpu.engine.renderer import render_rays_budget_packed
    from cednerf_tpu.ops import losses as L

    field, params, o, d, cand, ts, bkgd = _setup(seed=4, r=8, m=16)
    budget = 96
    pixels = jnp.asarray(np.random.default_rng(7).random((8, 3)), jnp.float32)

    def total_loss(p, packed, n_blocks=1, assembly_impl="gather"):
        render = render_rays_budget_packed if packed else render_rays_budget
        kw = {"assembly_impl": assembly_impl} if packed else {}
        out = render(field, p, o, d, cand, ts, bkgd, jnp.float32(0.5),
                     budget=budget, alpha_thre=1e-3, train=True,
                     n_blocks=n_blocks, **kw)
        e = out.extras
        complete = e["complete"]
        loss = jnp.sum((out.rgb - pixels) ** 2)
        if packed:
            starts, counts = e["starts"], e["counts"]
            loss += L.packed_distortion_loss(
                e["weights_p"], e["t_starts_p"], e["dts_p"], starts, counts,
                budget, complete, n_blocks=n_blocks)
            loss += L.packed_rgbper_loss(
                e["rgbs_p"], pixels, jax.lax.stop_gradient(e["weights_p"]),
                starts, counts, budget, complete)
            loss += L.packed_ray_sum_mean(
                e["latent_p"] * jax.lax.stop_gradient(e["weights_p"]),
                starts, counts, budget, complete)
            loss += L.packed_per_ray_mean(
                e["weight_loss_p"] * e["weights_p"], e["valid_p"],
                starts, counts, budget, complete)
        else:
            loss += L.distortion_loss(e["weights"], e["t_starts"],
                                      e["t_ends"], e["mask"],
                                      ray_weights=complete)
            loss += L.rgbper_loss(e["rgbs"], pixels,
                                  jax.lax.stop_gradient(e["weights"]),
                                  e["mask"], ray_weights=complete)
            loss += L.ray_mean(e["latent_losses"].reshape(-1), complete)
            loss += L.ray_mean(e["weight_losses"].reshape(-1), complete)
        return loss, out

    (ld, outd), gd = jax.value_and_grad(
        lambda p: total_loss(p, False), has_aux=True)(params)
    (lp, outp), gp = jax.value_and_grad(
        lambda p: total_loss(p, True), has_aux=True)(params)

    np.testing.assert_allclose(np.asarray(outp.rgb), np.asarray(outd.rgb),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(outp.opacity),
                               np.asarray(outd.opacity), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(outp.depth),
                               np.asarray(outd.depth), rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(outp.extras["complete"]),
                                  np.asarray(outd.extras["complete"]))
    assert float(outp.n_samples) == float(outd.n_samples)
    np.testing.assert_allclose(float(lp), float(ld), rtol=2e-4)
    flat_d = jax.tree_util.tree_leaves_with_path(gd)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(gp))
    for path, vd in flat_d:
        vp = flat_p[path]
        sc = np.abs(np.asarray(vd, np.float32)).max() + 1e-8
        np.testing.assert_allclose(
            np.asarray(vp, np.float32) / sc, np.asarray(vd, np.float32) / sc,
            atol=5e-3, err_msg=str(path))

    # multi-block layout agrees too (block-local cumsums + padding)
    (lb, outb), _ = jax.value_and_grad(
        lambda p: total_loss(p, True, n_blocks=2), has_aux=True)(params)
    np.testing.assert_allclose(np.asarray(outb.rgb), np.asarray(outd.rgb),
                               rtol=2e-4, atol=2e-4)

    # uniform-step lattice: cumsum assembly with uniform_dt (per-slot t
    # reconstructed from t_min[ray] + column*dt, no lattice gather) matches
    # the gather assembly on the same candidates
    s = 0.03
    t0u = (jnp.arange(16, dtype=jnp.float32)[None, :] * s
           + jnp.linspace(0.0, 0.02, 8)[:, None])
    cand_u = cand._replace(t_starts=t0u, dts=jnp.full_like(t0u, s))

    def loss_u(p, assembly_impl, uniform_dt, nb=1):
        out = render_rays_budget_packed(
            field, p, o, d, cand_u, ts, bkgd, jnp.float32(0.5),
            budget=budget, alpha_thre=1e-3, train=True, n_blocks=nb,
            assembly_impl=assembly_impl, uniform_dt=uniform_dt)
        return jnp.sum((out.rgb - pixels) ** 2), out

    for nb in (1, 2):
        (lug, outug), gug = jax.value_and_grad(
            lambda p: loss_u(p, "gather", None, nb), has_aux=True)(params)
        (luc, outuc), guc = jax.value_and_grad(
            lambda p: loss_u(p, "cumsum", s, nb), has_aux=True)(params)
        np.testing.assert_allclose(np.asarray(outuc.rgb),
                                   np.asarray(outug.rgb),
                                   rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(float(luc), float(lug), rtol=3e-4)
        for (pth, vg), (_, vc) in zip(
                jax.tree_util.tree_leaves_with_path(gug),
                jax.tree_util.tree_leaves_with_path(guc)):
            sc_ = np.abs(np.asarray(vg, np.float32)).max() + 1e-8
            np.testing.assert_allclose(np.asarray(vc, np.float32) / sc_,
                                       np.asarray(vg, np.float32) / sc_,
                                       atol=5e-3,
                                       err_msg=f"uniform nb={nb} {pth}")

    # cumsum assembly (segment-broadcast ri/base) matches the gather
    # assembly's outputs and gradients at the same block layout (a multi-
    # block layout can drop different rays than the single-block dense
    # reference, so gather-vs-cumsum at equal nb is the valid comparison)
    for nb in (1, 2):
        (lg, outg), gg = jax.value_and_grad(
            lambda p: total_loss(p, True, n_blocks=nb), has_aux=True)(params)
        (lc, outc), gc = jax.value_and_grad(
            lambda p: total_loss(p, True, n_blocks=nb,
                                 assembly_impl="cumsum"),
            has_aux=True)(params)
        np.testing.assert_allclose(np.asarray(outc.rgb),
                                   np.asarray(outg.rgb),
                                   rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(float(lc), float(lg), rtol=3e-4)
        flat_g = jax.tree_util.tree_leaves_with_path(gg)
        flat_c = dict(jax.tree_util.tree_leaves_with_path(gc))
        for path, vg in flat_g:
            vc = flat_c[path]
            sc = np.abs(np.asarray(vg, np.float32)).max() + 1e-8
            np.testing.assert_allclose(
                np.asarray(vc, np.float32) / sc,
                np.asarray(vg, np.float32) / sc,
                atol=5e-3, err_msg=f"nb={nb} {path}")


def test_uniform_dt_outlier_tmin_ray_does_not_corrupt_neighbors():
    """An AABB-miss ray carrying a huge slab t_min (no valid candidates)
    must not shift later rays' reconstructed t: the broadcast t_min column
    telescopes f32 first differences, so outliers are zeroed by counts."""
    field, params, o, d, cand, ts, bkgd = _setup(seed=11, r=8, m=16)
    s = 0.03
    t_min = jnp.linspace(0.0, 0.02, 8)
    t0u = t_min[:, None] + jnp.arange(16, dtype=jnp.float32)[None, :] * s
    valid = np.asarray(cand.valid).copy()
    valid[3] = False                       # ray 3: no candidates...
    t0u = t0u.at[3].add(1.0e8)             # ...and an outlier slab t_min
    cand_u = cand._replace(t_starts=t0u, dts=jnp.full_like(t0u, s),
                           valid=jnp.asarray(valid))
    from cednerf_tpu.engine.renderer import pack_budget_samples

    ps_g = pack_budget_samples(o, d, cand_u, ts, budget=96)
    ps_c = pack_budget_samples(o, d, cand_u, ts, budget=96,
                               assembly_impl="cumsum", uniform_dt=s)
    m = np.asarray(ps_g.valid)
    np.testing.assert_allclose(np.asarray(ps_c.t_starts)[m],
                               np.asarray(ps_g.t_starts)[m],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ps_c.pos)[m],
                               np.asarray(ps_g.pos)[m],
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("r,m,budget,p", [
    (64, 128, 2048, 0.3),    # typical steady state
    (64, 128, 2048, 0.02),   # nearly empty
    (32, 256, 1024, 0.9),    # heavy overflow (budget < demand)
    (24, 96, 512, 0.5),      # odd lattice
    (16, 128, 4096, 0.0),    # none valid
    (16, 128, 1024, 1.0),    # all valid, exact fit at budget boundary
])
def test_compact_select_rayfold_bit_exact(r, m, budget, p):
    from cednerf_tpu.engine.renderer import compact_select_rayfold
    valid = jr.uniform(jr.PRNGKey(r * m + budget), (r, m)) < p
    sel_x, kept_x, _ = compact_select(valid, budget)
    sel_f, kept_f = compact_select_rayfold(valid, budget)
    np.testing.assert_array_equal(np.asarray(sel_f), np.asarray(sel_x))
    np.testing.assert_array_equal(np.asarray(kept_f), np.asarray(kept_x))


def test_compact_select_rayfold_zero_count_ray_runs():
    # consecutive zero-count rays sharing a start must not steal slots
    from cednerf_tpu.engine.renderer import compact_select_rayfold
    valid = jnp.zeros((8, 16), bool)
    valid = valid.at[0, 3].set(True).at[0, 7].set(True)
    valid = valid.at[5, 0].set(True)   # rays 1-4 are empty
    sel_x, kept_x, _ = compact_select(valid, 64)
    sel_f, kept_f = compact_select_rayfold(valid, 64)
    np.testing.assert_array_equal(np.asarray(sel_f), np.asarray(sel_x))
    np.testing.assert_array_equal(np.asarray(kept_f), np.asarray(kept_x))
