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

from cednerf_tpu.ops.brick_grid import BrickGridSpec, brick_encode
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

    for (L, F) in ((16, 2), (8, 4), (8, 2)):
        spec = BrickGridSpec(n_levels=L, n_features=F, base_res=16,
                             max_res=1024)
        params = spec.init_params(key)
        add(f"L{L}F{F} fwd", jax.jit(lambda p, x, s=spec: jnp.sum(
            brick_encode(x, p, s).astype(jnp.float32))), (params, x))
        add(f"L{L}F{F} fwd+bwd tables", jax.jit(jax.grad(
            lambda p, x, s=spec: jnp.sum(
                brick_encode(x, p, s).astype(jnp.float32)))), (params, x))
        for impl in ("lanes", "contract"):
            add(f"L{L}F{F} fwd+bwd tables+x [{impl}]", jax.jit(jax.grad(
                lambda p, x, s=spec, i=impl: jnp.sum(
                    brick_encode(x, p, s, dx_impl=i).astype(jnp.float32)),
                argnums=(0, 1))), (params, x))

    run()


if __name__ == "__main__":
    main()
