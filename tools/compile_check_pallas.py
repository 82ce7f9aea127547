"""Compile-only Mosaic lowering check of the Pallas encoder/scatter paths.

`check_pallas_tpu.py` runs on the chip; this only LOWERS + AOT-compiles
(the axon tunnel compiles chiplessly), so it can probe Mosaic legality
while the chip is busy with a measurement queue.

Usage: python tools/compile_check_pallas.py
"""

import sys

import jax
import jax.numpy as jnp
import jax.random as jr

sys.path.insert(0, ".")


def main():
    from cednerf_tpu.ops import brick_grid as bg
    from cednerf_tpu.ops.pallas_scatter import scatter_add_rows
    print(f"backend: {jax.default_backend()}", flush=True)

    ok = True

    # raw scatter kernel
    try:
        jax.jit(
            lambda r, u: scatter_add_rows(
                r, u, n_rows=16384, accum_dtype=jnp.bfloat16,
                interpret=False)
        ).lower(
            jax.ShapeDtypeStruct((262144,), jnp.int32),
            jax.ShapeDtypeStruct((262144, 256), jnp.bfloat16),
        ).compile()
        print("scatter_add_rows: COMPILE OK", flush=True)
    except Exception as e:  # noqa: BLE001
        ok = False
        print(f"scatter_add_rows: FAIL {type(e).__name__}: "
              f"{str(e)[:2000]}", flush=True)

    # encoder combos (forward + backward through value_and_grad)
    mk = lambda impl, scat: bg.BrickGridSpec(
        n_levels=8, n_features=4, base_res=16, max_res=4096,
        log2_hashmap_size=19, max_table_rows=16384,
        grad_accum_dtype="bfloat16", interp_impl=impl, scatter_impl=scat)
    params = mk("xla", "xla").init_params(jr.PRNGKey(0))

    def loss(spec):
        def f(p, xx):
            out = bg.brick_encode(xx, p, spec, compute_dtype=jnp.float32)
            return jnp.sum(jnp.sin(out * 100.0))
        return jax.jit(jax.value_and_grad(f, argnums=(0, 1)))

    xs = jax.ShapeDtypeStruct((8192, 3), jnp.float32)
    pshape = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
    for impl, scat in (("xla", "pallas"), ("xla", "fused"),
                       ("pallas", "xla"), ("pallas", "fused")):
        try:
            loss(mk(impl, scat)).lower(pshape, xs).compile()
            print(f"interp={impl:7s} scatter={scat:7s}: COMPILE OK",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            ok = False
            print(f"interp={impl:7s} scatter={scat:7s}: FAIL "
                  f"{type(e).__name__}: {str(e)[:2000]}", flush=True)

    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
