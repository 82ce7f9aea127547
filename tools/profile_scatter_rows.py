"""Map XLA scatter-add rate vs destination table rows (the cellfused lesson).

Session-7 benched the level-fused cell encoder at a 3x end-to-end REGRESSION,
and the session-8 lane-width probe measured 5.2M random [*,32] updates into a
[2.2M,32] table at ~420 ns/row — 40x the ~10 ns/row wall seen at 16384-row
brick tables. So XLA's scatter-add rate is NOT table-size-insensitive (the
round-1 finding was measured only at 16k rows). This tool maps the curve:

  rows in {16k, 64k, 256k, 1M, 4M} x width in {32, 256} x {random, ray-run}
  index patterns, fixed 1M updates, bf16, in-program marginal cost (each
  measured op timed as the delta between K-op and 1-op programs to subtract
  the fixed dispatch floor).

ray-run indices model packed ray-coherent samples: runs of geometric length
(mean 1.6) over a clustered row set — the encoder's actual access pattern.

Usage (TPU): python tools/profile_scatter_rows.py [--n 1048576] [--iters 20]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def ray_run_indices(rng, n, n_rows):
    """Clustered, run-length indices like packed ray samples hitting cells."""
    import numpy as np
    # ~n/1.6 runs; each run repeats one row 1-4 times; rows walk a coarse
    # cluster (consecutive rays hit nearby cells)
    n_runs = int(n / 1.6) + 1
    runs = rng.integers(1, 5, size=n_runs)
    base = (rng.standard_normal(n_runs) * 0.02 + rng.random(n_runs)) % 1.0
    rows = (base * n_rows).astype(np.int64)
    idx = np.repeat(rows, runs)[:n]
    if idx.shape[0] < n:
        idx = np.pad(idx, (0, n - idx.shape[0]), mode="edge")
    return idx.astype(np.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1048576)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=4,
                    help="scatters per program for marginal-cost timing")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    n, reps = args.n, args.reps
    rng = np.random.default_rng(0)

    def timeit(fn, *a):
        jf = jax.jit(fn)
        out = jf(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:4]
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = jf(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:4]
        return (time.perf_counter() - t0) / args.iters

    print(f"n={n} reps={reps} (marginal = (t_reps - t_1)/(reps-1))",
          flush=True)

    # ---- gather marginals: validates the W=64-rows-2x-faster hypothesis
    # (the session-8 dma probe was standalone, where the ~5 ms fixed
    # dispatch cost confounds narrow-row rates)
    for n_rows in (442368, 1769472):
        for w in (32, 64, 128):
            table = jnp.asarray(rng.standard_normal((n_rows, w)),
                                jnp.bfloat16)
            idx = jnp.asarray(
                rng.integers(0, n_rows, size=n).astype(np.int32))

            def gat(t, i, k):
                s = jnp.zeros((), jnp.float32)
                for j in range(k):
                    # shift indices per rep (cheap [N] op) so XLA can't CSE
                    # the takes; table stays untouched
                    ij = (i + j) % n_rows
                    s += jnp.sum(jnp.take(t, ij, axis=0)
                                 .astype(jnp.float32))
                return s

            t1 = timeit(lambda t, i: gat(t, i, 1), table, idx)
            tk = timeit(lambda t, i: gat(t, i, reps), table, idx)
            marg = (tk - t1) / (reps - 1)
            print(f"GATHER rows={n_rows:8d} W={w:3d} "
                  f"t1={t1*1e3:8.2f} ms  marginal={marg*1e3:8.2f} ms "
                  f"({marg/n*1e9:6.1f} ns/row)", flush=True)

    for n_rows in (16384, 65536, 262144, 1048576, 4194304):
        for w in (32, 256):
            upd = jnp.asarray(rng.standard_normal((n, w)), jnp.bfloat16)
            for pat in ("random", "rayrun"):
                if pat == "random":
                    idx_np = rng.integers(0, n_rows, size=n).astype(np.int32)
                else:
                    idx_np = ray_run_indices(rng, n, n_rows)
                idx = jnp.asarray(idx_np)

                def scat(u, i, k):
                    t = jnp.zeros((n_rows, w), jnp.bfloat16)
                    for j in range(k):
                        # vary the update so XLA can't CSE the scatters
                        t = t.at[i].add(u * (1.0 + 0.001 * j))
                    return jnp.sum(t.astype(jnp.float32))

                t1 = timeit(lambda u, i: scat(u, i, 1), upd, idx)
                tk = timeit(lambda u, i: scat(u, i, reps), upd, idx)
                marg = (tk - t1) / (reps - 1)
                print(f"rows={n_rows:8d} W={w:3d} {pat:6s} "
                      f"t1={t1*1e3:8.2f} ms  marginal={marg*1e3:8.2f} ms "
                      f"({marg/n*1e9:6.1f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
