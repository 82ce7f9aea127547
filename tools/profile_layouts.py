"""Microbench the 1-D / pseudo-1-D layout pathologies the 1M-budget trace
exposed (docs/PERF_PLAN.md, 08-19 update):

  * fusion.1630: elementwise where+min over s32[1,1M] in T(1,128) = 37 ms
  * fusion.1625/1626: the lattice cumsum's decomposed pieces = 24 ms
  * fusion.1687/1690: [R]-element boundary gathers from f32[B] = 9 ms each
  * fusion.1692: backward of take(base[R], ray[B]) = B-row scalar scatter

Arms compare the shipped formulation against 2-D reshaped / widened /
cumsum-based rewrites. Run on the chip:
  python tools/profile_layouts.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from cednerf_tpu.utils import enable_compile_cache
enable_compile_cache()


def timed(fn, *args, reps=10):
    def scanned(a0, *rest):
        def body(c, i):
            out = fn(a0 + i.astype(a0.dtype) * 0, *rest)
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


def cumsum2d(flat, dtype=jnp.int32):
    """Inclusive cumsum of a flat [n] array via two-level [n/128, 128] form.

    n must be a multiple of 128*128 (the renderer lattice is: rays are
    bucketed in multiples of 64 and max_march_steps is 1024).
    """
    k = 128
    v2 = flat.reshape(-1, k).astype(dtype)          # [n/128, 128]
    c2 = jnp.cumsum(v2, axis=1)
    rows = c2[:, -1]                                # [n/128]
    r2 = rows.reshape(-1, k)                        # [n/16384, 128]
    cr = jnp.cumsum(r2, axis=1)
    rr = cr[:, -1]                                  # [n/16384]
    off2 = jnp.cumsum(rr) - rr
    row_off = (cr - r2 + off2[:, None]).reshape(-1)  # exclusive per-row
    return (c2 + row_off[:, None]).reshape(-1)


def sel_current(valid, budget):
    """The shipped compact_select one_block under a 1-wide vmap."""
    n = valid.size

    def one_block(flat, blk):
        dest = jnp.cumsum(flat.astype(jnp.int32)) - 1
        write = flat & (dest < budget)
        scat = jnp.where(write, dest, budget + jnp.arange(n, dtype=jnp.int32))
        sel = (jnp.full((budget,), n, jnp.int32)
               .at[scat].set(jnp.arange(n, dtype=jnp.int32), mode="drop",
                             unique_indices=True))
        return sel, write, dest

    sel_b, write_b, _ = jax.vmap(one_block)(
        valid.reshape(1, n), jnp.arange(1, dtype=jnp.int32))
    sel = jnp.where(sel_b < n, sel_b, n).reshape(-1)
    sel_c = jnp.minimum(sel, n - 1)
    return sel_c, write_b


def sel_novmap(valid, budget):
    """Same math, no vmap: everything stays 1-D [n]."""
    flat = valid.reshape(-1)
    n = flat.size
    dest = jnp.cumsum(flat.astype(jnp.int32)) - 1
    write = flat & (dest < budget)
    scat = jnp.where(write, dest, budget + jnp.arange(n, dtype=jnp.int32))
    sel = (jnp.full((budget,), n, jnp.int32)
           .at[scat].set(jnp.arange(n, dtype=jnp.int32), mode="drop",
                         unique_indices=True))
    sel_c = jnp.minimum(sel, n - 1)
    return sel_c, write


def sel_2d(valid, budget):
    """2-D two-level cumsum; scatter and downstream stay 1-D."""
    flat = valid.reshape(-1)
    n = flat.size
    dest = cumsum2d(flat) - 1
    write = flat & (dest < budget)
    scat = jnp.where(write, dest, budget + jnp.arange(n, dtype=jnp.int32))
    sel = (jnp.full((budget,), n, jnp.int32)
           .at[scat].set(jnp.arange(n, dtype=jnp.int32), mode="drop",
                         unique_indices=True))
    sel_c = jnp.minimum(sel, n - 1)
    return sel_c, write


def sel_2d_full(valid, budget):
    """2-D cumsum AND 2-D downstream elementwise (sel kept [budget/128,128])."""
    flat = valid.reshape(-1)
    n = flat.size
    dest = cumsum2d(flat) - 1
    write = flat & (dest < budget)
    scat = jnp.where(write, dest, budget + jnp.arange(n, dtype=jnp.int32))
    sel = (jnp.full((budget,), n, jnp.int32)
           .at[scat].set(jnp.arange(n, dtype=jnp.int32), mode="drop",
                         unique_indices=True))
    sel2 = sel.reshape(-1, 128)
    sel_c = jnp.minimum(sel2, n - 1)
    return sel_c, write


def main():
    for (R, M, budget) in ((1856, 1024, 262144), (7104, 1024, 1048576)):
        n = R * M
        rng = np.random.default_rng(0)
        valid = jnp.asarray(rng.random((R, M)) < budget * 0.85 / n)
        print(f"\n== sel build: lattice {R}x{M}={n / 1e6:.2f}M "
              f"budget {budget // 1024}k ==")
        for name, fn in (("current(vmap)", sel_current),
                         ("no-vmap 1-D", sel_novmap),
                         ("2-D cumsum", sel_2d),
                         ("2-D cumsum+out", sel_2d_full)):
            t = timed(lambda v, fn=fn: fn(v, budget), valid)
            print(f"  {name:16s} {t:7.2f} ms")

    B, R = 1048576, 7104
    key = jax.random.PRNGKey(1)
    vals = jax.random.normal(key, (B + 1,), jnp.float32)
    starts = jnp.sort(jax.random.randint(key, (R,), 0, B))
    counts = jnp.diff(jnp.concatenate([starts, jnp.array([B])]))
    ray = jnp.repeat(jnp.arange(R, dtype=jnp.int32), counts,
                     total_repeat_length=B)
    g = jax.random.normal(key, (B,), jnp.float32)
    base = jax.random.normal(key, (R,), jnp.float32)

    print(f"\n== boundary gather: take(f32[{B}+1], starts[{R}]) ==")
    print("  1-D scalar    ", f"{timed(lambda v: jnp.take(v, starts), vals):7.2f} ms")
    vals2 = vals[:B].reshape(-1, 128)
    # row+lane decomposition: gather 128-wide rows then pick the lane by dot
    def row_lane(v2):
        rows = jnp.take(v2, starts // 128, axis=0)        # [R, 128]
        lane = jax.nn.one_hot(starts % 128, 128, dtype=v2.dtype)
        return jnp.sum(rows * lane, axis=-1)
    print("  row+lane pick ", f"{timed(row_lane, vals2):7.2f} ms")

    print(f"\n== per-slot base: take(base[{R}], ray[{B}]) fwd/bwd ==")
    print("  fwd gather    ", f"{timed(lambda b: jnp.take(b, ray, indices_are_sorted=True), base):7.2f} ms")
    def bwd_scatter(gg):
        return jnp.zeros((R,), jnp.float32).at[ray].add(
            gg, indices_are_sorted=True)
    print("  bwd scatter   ", f"{timed(bwd_scatter, g):7.2f} ms")
    def bwd_cumsum(gg):
        zx = jnp.cumsum(gg)
        ends = jnp.concatenate([starts[1:], jnp.array([B], jnp.int32)])
        zpad = jnp.concatenate([jnp.zeros((1,), jnp.float32), zx])
        return jnp.take(zpad, ends) - jnp.take(zpad, starts)
    print("  bwd cumsum+bg ", f"{timed(bwd_cumsum, g):7.2f} ms")

    print(f"\n== elementwise where+min over {B} s32 ==")
    selv = jnp.arange(B, dtype=jnp.int32)
    for name, x in (("[1,B] vmap-ish", selv.reshape(1, B)),
                    ("[B] 1-D", selv),
                    ("[B/128,128] 2-D", selv.reshape(-1, 128))):
        t = timed(lambda s: jnp.minimum(jnp.where(s < B - 3, s, B), B - 1), x)
        print(f"  {name:16s} {t:7.2f} ms")


if __name__ == "__main__":
    main()
