"""Benchmark the Pallas VMEM-accumulator scatter vs XLA .at[].add on v5e.

The last open idea from the round-2 scatter experiments (ROADMAP): XLA's
scatter-add is per-row overhead-bound (~150 M rows/s); a sequential-grid
Pallas kernel holding the whole accumulator in VMEM replaces each row's
HBM round trip with a VMEM RMW. This measures whether that wins at the
encoder's real shapes (N=262k samples, W=256 lanes, 16384/8192/1000/216
rows), plus the MXU one-hot matmul for tiny dense tables.

Run on the tunneled chip: python tools/profile_pallas_scatter.py
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from cednerf_tpu.ops.pallas_scatter import scatter_add_onehot, scatter_add_rows
from cednerf_tpu.utils import enable_compile_cache

enable_compile_cache()


def timed(fn, *args, reps=10):
    def scanned(a0, *rest):
        def body(c, i):
            out = fn(a0 + i.astype(a0.dtype) * 0, *rest)
            return c + jnp.sum(out.astype(jnp.float32)), None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(reps))
        return c

    red = jax.jit(scanned)
    _ = float(red(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(red(*args))
        best = min(best, (time.perf_counter() - t0) / reps * 1e3)
    return best


def main():
    n, w = 262144, 256
    key = jax.random.PRNGKey(0)
    upd = jax.random.normal(key, (n, w), jnp.float32).astype(jnp.bfloat16)

    for n_rows in (16384, 8192, 5832, 1000, 216):
        rows = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, n_rows)
        t = timed(lambda r: jnp.zeros((n_rows, w), jnp.float32)
                  .at[r].add(upd.astype(jnp.float32)), rows)
        print(f"R={n_rows:6d} xla f32 .at[].add:      {t:6.2f} ms",
              flush=True)
        t = timed(lambda r: jnp.zeros((n_rows, w), jnp.bfloat16)
                  .at[r].add(upd), rows)
        print(f"R={n_rows:6d} xla bf16 .at[].add:     {t:6.2f} ms",
              flush=True)
        adt = jnp.bfloat16 if n_rows > 8192 else jnp.float32
        for tile in (2048, 8192):
            for unroll in (1, 4, 8):
                try:
                    t = timed(lambda r: scatter_add_rows(
                        r, upd, n_rows=n_rows, accum_dtype=adt, tile=tile,
                        unroll=unroll), rows)
                    print(f"R={n_rows:6d} pallas {jnp.dtype(adt).name:8s}"
                          f" tile={tile:5d} u={unroll}: {t:6.2f} ms",
                          flush=True)
                except Exception as e:  # Mosaic OOM etc.
                    print(f"R={n_rows:6d} pallas tile={tile} u={unroll}: "
                          f"FAILED {type(e).__name__}: {str(e)[:120]}",
                          flush=True)
        if n_rows <= 1000:
            t = timed(lambda r: scatter_add_onehot(r, upd, n_rows=n_rows),
                      rows)
            print(f"R={n_rows:6d} onehot matmul:          {t:6.2f} ms",
                  flush=True)

    # ray-coherent collisions: runs of ~16 identical rows (coarse levels)
    n_rows = 16384
    rows_coh = (jnp.arange(n) // 16 * 977) % n_rows
    t = timed(lambda r: jnp.zeros((n_rows, w), jnp.bfloat16)
              .at[r].add(upd), rows_coh)
    print(f"coherent xla bf16:            {t:6.2f} ms", flush=True)
    t = timed(lambda r: scatter_add_rows(
        r, upd, n_rows=n_rows, accum_dtype=jnp.bfloat16, tile=8192,
        unroll=8), rows_coh)
    print(f"coherent pallas bf16:         {t:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
