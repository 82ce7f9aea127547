"""Microbench the train step's scatter-dominated ops (trace r2 findings):

  * encoder table-grad scatter-add: f32 vs bf16 accumulator, per table size
  * matmul-based table grad (onehot^T @ upd) for small dense tables
  * renderer scatter-back: lattice size and dtype variants
  * compaction `sel` scatter: lattice size variants

Run: PYTHONPATH=.:/root/.axon_site python tools/profile_scatters.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from cednerf_tpu.utils import enable_compile_cache
enable_compile_cache()


def timed(fn, *args, reps=10):
    """Device ms/call: scan `reps` iterations in one dispatch, perturb the
    first arg per-iteration to defeat CSE/hoisting, fetch a scalar to sync."""
    def scanned(a0, *rest):
        def body(c, i):
            out = fn(a0 + i.astype(a0.dtype) * 0, *rest)  # dep on i via a0
            r = jax.tree_util.tree_reduce(
                lambda acc, x: acc + jnp.sum(x.astype(jnp.float32)), out, 0.0)
            return c + r, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(reps))
        return c

    red = jax.jit(scanned)
    _ = float(red(*args))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        _ = float(red(*args))
        best = min(best, (time.perf_counter() - t0) / reps * 1e3)
    return best


def main():
    N = 262144
    W = 256
    key = jax.random.PRNGKey(0)
    upd_f32 = jax.random.normal(key, (N, W), jnp.float32)
    upd_bf16 = upd_f32.astype(jnp.bfloat16)

    print("== encoder table-grad scatter-add ([262k, 256] rows) ==")
    for rows in (16384, 5832, 1000, 216):
        idx = jax.random.randint(jax.random.PRNGKey(rows), (N,), 0, rows)

        def scat_f32(upd, idx=idx, rows=rows):
            return jnp.zeros((rows, W), jnp.float32).at[idx].add(upd)

        def scat_bf16(upd, idx=idx, rows=rows):
            return jnp.zeros((rows, W), jnp.bfloat16).at[idx].add(
                upd).astype(jnp.float32)

        t32 = timed(scat_f32, upd_f32)
        t16 = timed(scat_bf16, upd_bf16)
        line = f"rows={rows:6d}  f32 {t32:6.2f} ms   bf16 {t16:6.2f} ms"
        if rows <= 5832:
            eye = None

            def mat_grad(upd, idx=idx, rows=rows):
                onehot = (idx[:, None] == jnp.arange(rows)[None, :]
                          ).astype(jnp.bfloat16)
                return jax.lax.dot_general(
                    onehot, upd, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            tm = timed(mat_grad, upd_bf16)
            line += f"   matmul {tm:6.2f} ms"
        print(line, flush=True)

    print("== renderer scatter-back (packed -> dense lattice) ==")
    budget = 262144
    packed5 = jax.random.normal(key, (budget, 5), jnp.float32)
    for n in (2162688, 540672):
        scat = jnp.sort(jax.random.randint(
            jax.random.PRNGKey(n), (budget,), 0, n))

        def back_f32(p, scat=scat, n=n):
            return jnp.zeros((n, 5), jnp.float32).at[scat].set(
                p, mode="drop", unique_indices=True, indices_are_sorted=True)

        def back_bf16(p, scat=scat, n=n):
            return jnp.zeros((n, 8), jnp.bfloat16).at[scat].set(
                jnp.pad(p, ((0, 0), (0, 3))).astype(jnp.bfloat16),
                mode="drop", unique_indices=True, indices_are_sorted=True)

        print(f"n={n:8d}  f32x5 {timed(back_f32, packed5):6.2f} ms   "
              f"bf16x8 {timed(back_bf16, packed5):6.2f} ms", flush=True)

    print("== compaction sel scatter (lattice -> [budget]) ==")
    for n in (2162688, 540672):
        valid = jax.random.uniform(jax.random.PRNGKey(n), (n,)) < (budget * 0.9 / n)

        def build_sel(v, n=n):
            flat = v
            dest = jnp.cumsum(flat.astype(jnp.int32)) - 1
            write = flat & (dest < budget)
            scat = jnp.where(write, dest, budget + jnp.arange(n, dtype=jnp.int32))
            sel = jnp.full((budget,), n, jnp.int32).at[scat].set(
                jnp.arange(n, dtype=jnp.int32), mode="drop",
                unique_indices=True)
            return sel

        print(f"n={n:8d}  cumsum+scatter {timed(build_sel, valid):6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
