"""Measure pipelined per-row DMA gather vs XLA's jnp.take on the real chip.

The decisive microbench for the round-3 fused-encoder plan (see
ops/pallas_gather.py): if depth-pipelined DMAs beat XLA's ~300-430 M rows/s
gather wall at cell-row shapes, a fused gather+interp+MLP kernel is worth
building; if not, row-count reduction stays the only encoder lever.

Usage (TPU):
  python tools/profile_dma_gather.py --rows 442368 --n 1048576 \
      --widths 128,256 --depths 4,8,16 --tiles 256,512,1024
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=442368,
                    help="table rows (default: one L8F4 fine cell table)")
    ap.add_argument("--n", type=int, default=1048576)
    ap.add_argument("--widths", default="128,256")
    ap.add_argument("--depths", default="4,8,16")
    ap.add_argument("--tiles", default="512,1024")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cednerf_tpu.ops.pallas_gather import dma_gather

    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (args.n,), 0, args.rows, jnp.int32)

    def timeit(fn, *a):
        out = fn(*a)
        np.asarray(out[:8])  # sync through the tunnel via host fetch
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        np.asarray(out[:8])
        dt = (time.perf_counter() - t0) / args.iters
        return dt, out

    for w in map(int, args.widths.split(",")):
        table = jax.random.normal(key, (args.rows, w), jnp.float32).astype(
            jnp.dtype(args.dtype))
        take = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        dt_x, ref = timeit(take, table, idx)
        print(f"W={w:4d} xla take: {dt_x*1e3:8.2f} ms  "
              f"{args.n/dt_x/1e6:7.1f} M rows/s", flush=True)
        for tile in map(int, args.tiles.split(",")):
            for depth in map(int, args.depths.split(",")):
                try:
                    dt, out = timeit(
                        lambda t, i: dma_gather(t, i, tile=tile, depth=depth),
                        table, idx)
                except Exception as e:  # compile/lowering failure is a result
                    print(f"W={w:4d} tile={tile:5d} depth={depth:3d} "
                          f"FAILED: {type(e).__name__}: {str(e)[:120]}",
                          flush=True)
                    continue
                ok = bool(jnp.array_equal(out[:4096], ref[:4096]))
                print(f"W={w:4d} tile={tile:5d} depth={depth:3d} dma: "
                      f"{dt*1e3:8.2f} ms  {args.n/dt/1e6:7.1f} M rows/s  "
                      f"match={ok}", flush=True)


if __name__ == "__main__":
    main()
