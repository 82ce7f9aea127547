"""A/B the round-3 fused encoder forward against the XLA path on-chip.

Arms, at bench shapes (L8F4, 16384-row hashed brick tables, N samples):
  xla_gather  — L x jnp.take of [N, 256] rows only (the irreducible row
                movement of any XLA-side path; interp math fuses into it
                in-program, so this is the XLA arm's floor)
  xla_encode  — L x (take + full lane-math interp) in one jit (the real
                two-stage forward at brick layout)
  fused       — ops/pallas_fused.fused_encode_fwd (DMA + interp, 1 kernel)

If fused < xla_gather the kernel wins outright (it already includes the
interp). Decision gate for wiring interp_impl="dma" into the train step.

Usage (TPU): python tools/profile_fused_enc.py --n 1048576 --tiles 512,1024
"""

import argparse
import math
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--levels", type=int, default=8)
    ap.add_argument("--features", type=int, default=4)
    ap.add_argument("--rows", type=int, default=16384)
    ap.add_argument("--tiles", default="512,1024,2048")
    ap.add_argument("--depths", default="8,16")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cednerf_tpu.ops import brick_grid as bg
    from cednerf_tpu.ops.pallas_encoder import interp_fwd
    from cednerf_tpu.ops.pallas_fused import fused_encode_fwd

    key = jax.random.PRNGKey(0)
    n, L, F = args.n, args.levels, args.features
    base_res, max_res = 16, 1024
    log_b = math.log(max_res / base_res) / (L - 1)
    x = jax.random.uniform(jax.random.fold_in(key, 99), (n, 3))
    scales, nbs, tables, rows_l = [], [], [], []
    for lvl in range(L):
        scale = bg.level_scale(lvl, log_b, base_res)
        nb = max(1, int(np.ceil((np.ceil(scale) + 1) / bg.BRICK_CELLS)))
        hashed = nb ** 3 > args.rows
        n_rows = args.rows if hashed else nb ** 3
        rows, _, _, _ = bg._level_geom(x, scale, nb, hashed, n_rows)
        tables.append(jax.random.normal(jax.random.fold_in(key, lvl),
                                        (n_rows, 64 * F), jnp.float32))
        scales.append(float(scale))
        nbs.append(nb)
        rows_l.append(rows)
    rows = jnp.stack(rows_l, 0)
    tables_bf = [t.astype(jnp.bfloat16) for t in tables]

    def timeit(fn, *a):
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0][:8])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0][:8])
        return (time.perf_counter() - t0) / args.iters

    gather = jax.jit(lambda ts, r: [jnp.take(t, r[l], axis=0)
                                    for l, t in enumerate(ts)])
    dt = timeit(gather, tables_bf, rows)
    print(f"xla_gather (bf16 rows): {dt*1e3:8.2f} ms "
          f"({n*L/dt/1e6:.0f} M rows/s)", flush=True)

    def xla_encode(ts, r, xq):
        feats = [jnp.take(t, r[l], axis=0) for l, t in enumerate(ts)]
        return interp_fwd(xq, feats, scales, nbs, F, tile=512)

    try:
        dt = timeit(jax.jit(xla_encode), tables_bf, rows, x)
        print(f"xla_encode (take + interp kernel): {dt*1e3:8.2f} ms",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"xla_encode FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)

    for tile in map(int, args.tiles.split(",")):
        for depth in map(int, args.depths.split(",")):
            try:
                dt = timeit(
                    lambda xq, ts, r: fused_encode_fwd(
                        xq, ts, r, scales, nbs, F, tile=tile, depth=depth),
                    x, tables, rows)
            except Exception as e:  # noqa: BLE001
                print(f"fused tile={tile:5d} depth={depth:3d} FAILED: "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
                continue
            print(f"fused tile={tile:5d} depth={depth:3d}: {dt*1e3:8.2f} ms "
                  f"({n*L/dt/1e6:.0f} M rows/s incl. interp)", flush=True)

    # backward arms: the round-1 fused bwd (XLA re-gather + feats operand)
    # vs the DMA bwd (in-kernel re-gather) on one hashed level
    from cednerf_tpu.ops.pallas_encoder import interp_bwd_fused
    from cednerf_tpu.ops.pallas_fused import fused_encode_bwd
    lvl = next(l for l in range(L) if tables[l].shape[0] == args.rows)
    g1 = jax.random.normal(jax.random.fold_in(key, 7), (n, F), jnp.float32)

    def bwd_r1(xq, gq, t, r):
        feats = jnp.take(t.astype(jnp.bfloat16), r, axis=0)
        return interp_bwd_fused(xq, gq, feats, r, scale=scales[lvl],
                                nb=nbs[lvl], n_rows=t.shape[0], n_feat=F,
                                accum_dtype=jnp.bfloat16)

    try:
        dt = timeit(jax.jit(bwd_r1), x, g1, tables[lvl], rows[lvl])
        print(f"bwd_r1 (take + fused accum) x1 level: {dt*1e3:8.2f} ms",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"bwd_r1 FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
    for tile in (256, 512):
        for depth in map(int, args.depths.split(",")):
            try:
                dt = timeit(
                    lambda xq, gq, t, r: fused_encode_bwd(
                        xq, gq, r, t, scale=scales[lvl], nb=nbs[lvl],
                        n_rows=t.shape[0], n_feat=F, tile=tile,
                        depth=depth, accum_dtype=jnp.bfloat16),
                    x, g1, tables[lvl], rows[lvl])
            except Exception as e:  # noqa: BLE001
                print(f"bwd_dma tile={tile:5d} depth={depth:3d} FAILED: "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)
                continue
            print(f"bwd_dma tile={tile:5d} depth={depth:3d}: "
                  f"{dt*1e3:8.2f} ms x1 level", flush=True)


if __name__ == "__main__":
    main()
