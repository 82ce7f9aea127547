"""Dissect brick-grid encoder cost on the real chip, A/B-ing implementation
variants inside ONE process (the tunneled chip's absolute rates drift
~1.5x between runs, so only in-run comparisons are trustworthy).

Usage: python tools/profile_encoder.py [--n 262144]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from cednerf_tpu.ops.brick_grid import (
    BrickGridSpec, brick_encode, brick_encode_fused)
from cednerf_tpu.utils import enable_compile_cache


def make_timer(iters, rounds=3):
    cases = []

    def add(name, fn, args):
        fn(*args)  # compile
        float(jnp.sum(jax.tree_util.tree_leaves(fn(*args))[0]
                      .astype(jnp.float32)))
        cases.append((name, fn, args, []))

    def run():
        for _ in range(rounds):
            for name, fn, args, times in cases:
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = fn(*args)
                float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                              .astype(jnp.float32)))
                times.append((time.perf_counter() - t0) / iters * 1e3)
        for name, _, _, times in cases:
            print(f"{name:52s} min {min(times):8.2f} ms  "
                  f"all {['%.1f' % t for t in times]}", flush=True)

    return add, run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    enable_compile_cache()

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (args.n, 3))
    add, run = make_timer(args.iters)

    # decomposition probes: geometry-only, geometry+gather (no interp math)
    from cednerf_tpu.ops.brick_grid import (_level_geom, _materialize_dense_bricks,
                                            level_scale)

    def probe_cases(spec, params, x, tag):
        layouts = spec.level_layout()

        def tables(p):
            out = []
            for lvl, lay in enumerate(layouts):
                if lay["hashed"]:
                    out.append(p[f"bricks_{lvl}"])
                else:
                    out.append(_materialize_dense_bricks(
                        p[f"grid_{lvl}"], lay["n_bricks_axis"]))
            return out

        def geom_only(p, xx):
            acc = jnp.zeros((xx.shape[0],), jnp.int32)
            for lvl, lay in enumerate(layouts):
                rows, intra, frac, ok = _level_geom(
                    xx, float(level_scale(lvl, spec.log_b, spec.base_res)),
                    lay["n_bricks_axis"], lay["hashed"], lay["rows"])
                acc = acc + rows + intra[:, 0]
            return jnp.sum(acc)

        def geom_gather(p, xx):
            tbs = tables(p)
            acc = jnp.zeros((), jnp.float32)
            for lvl, lay in enumerate(layouts):
                rows, _, _, _ = _level_geom(
                    xx, float(level_scale(lvl, spec.log_b, spec.base_res)),
                    lay["n_bricks_axis"], lay["hashed"], lay["rows"])
                feats = jnp.take(tbs[lvl].astype(jnp.bfloat16), rows, axis=0)
                acc = acc + jnp.sum(feats.astype(jnp.float32))
            return acc

        add(f"{tag} geom only", jax.jit(geom_only), (params, x))
        add(f"{tag} geom+gather", jax.jit(geom_gather), (params, x))

    for (L, F) in ((16, 2), (8, 4), (8, 2)):
        spec = BrickGridSpec(n_levels=L, n_features=F, base_res=16,
                             max_res=1024)
        params = spec.init_params(key)
        probe_cases(spec, params, x, f"L{L}F{F}")
        add(f"L{L}F{F} fwd", jax.jit(lambda p, x, s=spec: jnp.sum(
            brick_encode(x, p, s).astype(jnp.float32))), (params, x))
        add(f"L{L}F{F} fwd+bwd tables", jax.jit(jax.grad(
            lambda p, x, s=spec: jnp.sum(
                brick_encode(x, p, s).astype(jnp.float32)))), (params, x))
        add(f"L{L}F{F} fwd+bwd tables+x [contract]", jax.jit(jax.grad(
            lambda p, x, s=spec: jnp.sum(
                brick_encode(x, p, s).astype(jnp.float32)),
            argnums=(0, 1))), (params, x))
        add(f"L{L}F{F} fwd [cmp]", jax.jit(lambda p, x, s=spec: jnp.sum(
            brick_encode(x, p, s, dx_impl="cmp").astype(jnp.float32))),
            (params, x))
        add(f"L{L}F{F} fwd+bwd tables [cmp]", jax.jit(jax.grad(
            lambda p, x, s=spec: jnp.sum(
                brick_encode(x, p, s, dx_impl="cmp").astype(jnp.float32)))),
            (params, x))
        add(f"L{L}F{F} fwd+bwd tables+x [cmp]", jax.jit(jax.grad(
            lambda p, x, s=spec: jnp.sum(
                brick_encode(x, p, s, dx_impl="cmp").astype(jnp.float32)),
            argnums=(0, 1))), (params, x))

    run()


if __name__ == "__main__":
    main()
