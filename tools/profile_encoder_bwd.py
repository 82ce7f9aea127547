"""Isolate the cost pieces of the brick-encoder backward on the real chip.

The full fwd+bwd(tables+x) is ~95-98 ms at L16F2/262k while fwd alone is
39 ms and the table-grad scatter only ~4 ms (cmp variant) — this script
times the d_x ingredients separately to find the missing ~44 ms.
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from cednerf_tpu.ops.brick_grid import (
    BrickGridSpec, _level_geom, _lane_axis_weights_2d,
    _materialize_dense_bricks, level_scale)
from cednerf_tpu.utils import enable_compile_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    enable_compile_cache()

    key = jax.random.PRNGKey(0)
    n = args.n
    x = jax.random.uniform(key, (n, 3))
    spec = BrickGridSpec(n_levels=16, n_features=2, base_res=16, max_res=1024)
    params = spec.init_params(key)
    layouts = spec.level_layout()
    L, F, W = spec.n_levels, spec.n_features, spec.row_width
    # pretend pre-gathered per-level rows + cotangent
    feats = [jax.random.normal(jax.random.fold_in(key, l), (n, W),
                               jnp.bfloat16) for l in range(L)]
    g = jax.random.normal(jax.random.fold_in(key, 99), (n, L * F),
                          jnp.bfloat16)

    def geoms(xx):
        out = []
        for lvl, lay in enumerate(layouts):
            out.append(_level_geom(
                xx, float(level_scale(lvl, spec.log_b, spec.base_res)),
                lay["n_bricks_axis"], lay["hashed"], lay["rows"]))
        return out

    def lanes_for(intra, frac, with_d):
        ws, dws = [], []
        for a in range(3):
            w, dw = _lane_axis_weights_2d(a, intra[:, a], frac[:, a],
                                          jnp.bfloat16, F, with_d)
            ws.append(w)
            dws.append(dw)
        return ws, dws

    def dx_only(xx, fts, gg):
        """d_frac for all levels from pre-gathered feats (no scatter)."""
        acc = jnp.zeros((n, 3), jnp.float32)
        for lvl, (rows, intra, frac, ok) in enumerate(geoms(xx)):
            (wx, wy, wz), (dwx, dwy, dwz) = lanes_for(intra, frac, True)
            gl = gg[:, lvl * F:(lvl + 1) * F]
            gout = jnp.repeat(gl, 64, axis=1) if F == 2 else None
            # lane layout c*F+f: repeat([g0,g1],64) gives g0 g1 g0 g1... ok
            h = fts[lvl] * gout

            def lane_dot(a_, b_, c_):
                return jnp.sum((h * a_ * b_ * c_).astype(jnp.float32), axis=-1)

            d_frac = jnp.stack(
                [lane_dot(dwx, wy, wz), lane_dot(wx, dwy, wz),
                 lane_dot(wx, wy, dwz)], axis=-1)
            scl = float(level_scale(lvl, spec.log_b, spec.base_res))
            acc = acc + d_frac * jnp.float32(scl) * ok
        return jnp.sum(acc)

    def scatter_only(xx, gg):
        """cmp-style table grads only (scatter of upd rows)."""
        acc = jnp.zeros((), jnp.float32)
        for lvl, (rows, intra, frac, ok) in enumerate(geoms(xx)):
            (wx, wy, wz), _ = lanes_for(intra, frac, False)
            gl = gg[:, lvl * F:(lvl + 1) * F]
            gout = jnp.repeat(gl, 64, axis=1)
            upd = (wx * wy * wz) * gout
            d_table = jnp.zeros((layouts[lvl]["rows"], W), jnp.float32) \
                .at[rows].add(upd.astype(jnp.float32))
            acc = acc + jnp.sum(d_table)
        return acc

    def feats_consume(fts):
        acc = jnp.zeros((), jnp.float32)
        for f_ in fts:
            acc = acc + jnp.sum(f_.astype(jnp.float32))
        return acc

    cases = [
        ("feats read-only (1.07 GB)", jax.jit(feats_consume), (feats,)),
        ("dx_only (pre-gathered feats)", jax.jit(dx_only), (x, feats, g)),
        ("scatter_only", jax.jit(scatter_only), (x, g)),
    ]
    for name, fn, a in cases:
        fn(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(fn(*a))[0].astype(jnp.float32)))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(*a)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                          .astype(jnp.float32)))
            times.append((time.perf_counter() - t0) / args.iters * 1e3)
        print(f"{name:40s} min {min(times):8.2f} ms  "
              f"all {['%.1f' % t for t in times]}", flush=True)


if __name__ == "__main__":
    main()
