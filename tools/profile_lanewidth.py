"""Quantify the v5e 128-lane padding tax on cell-row-shaped (F=4 -> 32-lane)
ops, and whether width-packed forms pay.

PERF_PLAN hypothesis (2026-08-19): TPU pads the minor dim to 128 lanes, so
every materialized [*, 32] cell intermediate moves 4x its logical bytes and
every VPU pass wastes 3/4 of each register. This tool measures, on the real
chip at cellfused shapes (N*L ~ 5M rows at a 1M-sample L8F4 step):

  A. elementwise chain (5 mul/add passes) at [5N, 32] vs [5N/4, 128]
     vs [N, 160] — the pure lane-padding tax.
  B. gather [5N]->[5N,32] vs batched gather [N,5]->[N,5,32] reshaped to
     [N,160] — whether XLA's layout assignment avoids the padded minor dim
     when the consumer wants a wide row.
  C. scatter-add of [5N,32] rows vs [N,5]-indexed [N,5,32] updates —
     whether the batched form changes the ~9 ns/row wall or the padding.

Usage (TPU): python tools/profile_lanewidth.py --n 1048576 --levels 5
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1048576)
    ap.add_argument("--levels", type=int, default=5)
    ap.add_argument("--rows", type=int, default=442368,
                    help="cell-table rows per level")
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    n, L, W, R = args.n, args.levels, args.width, args.rows
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)

    def timeit(label, fn, *a):
        jf = jax.jit(fn)
        out = jf(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:4]
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jf(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:4]
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{label:42s} {dt*1e3:8.2f} ms", flush=True)
        return dt

    # ---- A: elementwise chain at three physical widths, equal logical work
    def chain(x):
        for _ in range(5):
            x = x * 1.0001 + 0.5
        return jnp.sum(x)

    a32 = jax.random.normal(k1, (n * L, W), jnp.bfloat16)
    a128 = a32.reshape(n * L // 4, W * 4)
    awide = jax.random.normal(k1, (n, L * W), jnp.bfloat16)
    timeit(f"A elementwise [{n*L},{W}]", chain, a32)
    timeit(f"A elementwise [{n*L//4},{W*4}]", chain, a128)
    timeit(f"A elementwise [{n},{L*W}]", chain, awide)

    # ---- B: gather forms
    table = jax.random.normal(k2, (R * L, W), jnp.bfloat16)
    idx_flat = jax.random.randint(k3, (n * L,), 0, R * L, jnp.int32)
    idx_2d = idx_flat.reshape(n, L)

    def g_flat(t, i):
        return jnp.sum(jnp.take(t, i, axis=0))

    def g_wide(t, i):
        rows = jnp.take(t, i, axis=0)          # [N, L, W]
        return jnp.sum(rows.reshape(n, L * W))  # consumer wants wide rows

    timeit(f"B gather flat [{n*L},{W}]", g_flat, table, idx_flat)
    timeit(f"B gather batched->[{n},{L*W}]", g_wide, table, idx_2d)

    # ---- C: scatter-add forms
    upd_flat = jax.random.normal(k3, (n * L, W), jnp.bfloat16)
    upd_3d = upd_flat.reshape(n, L, W)
    tbl0 = jnp.zeros((R * L, W), jnp.bfloat16)

    def s_flat(t, i, u):
        return t.at[i].add(u)

    def s_3d(t, i, u):
        return t.at[i].add(u)

    timeit(f"C scatter flat [{n*L},{W}]", s_flat, tbl0, idx_flat, upd_flat)
    timeit(f"C scatter batched [{n},{L},{W}]", s_3d, tbl0, idx_2d, upd_3d)


if __name__ == "__main__":
    main()
