"""Round-2 scatter design experiments (follow-up to profile_scatters.py).

Questions this answers, feeding the encoder-backward redesign:
  1. what does lax.sort of 262k i32 keys cost? (gates every sort-based plan)
  2. does `indices_are_sorted` speed scatter-ADD the way it sped the
     renderer's scatter-set?
  3. do wider rows amortize the ~21 ns/row scatter overhead? (an L4F8
     encoder halves the number of scatters at 2x the row width)
  4. full sort -> permute rows -> block-local one-hot matmul -> slab
     scatter pipeline vs the plain scatter-add it would replace
  5. does N scale linearly (per-row bound) as assumed?

Run: PYTHONPATH=.:/root/.axon_site python tools/profile_scatters2.py
"""

import time

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


def main():
    N = 262144
    R = 16384
    key = jax.random.PRNGKey(0)
    upd = jax.random.normal(key, (N, 256), jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, R)
    idx_sorted = jnp.sort(idx)

    print("== 1. sort cost (262k) ==", flush=True)
    t = timed(lambda i: jnp.sort(i + 0), idx)
    print(f"sort keys only:            {t:6.2f} ms", flush=True)
    t = timed(lambda i: jax.lax.sort((i + 0, jnp.arange(N, dtype=jnp.int32)),
                                     num_keys=1), idx)
    print(f"sort key+payload:          {t:6.2f} ms", flush=True)
    t = timed(lambda i: jnp.argsort(i + 0), idx)
    print(f"argsort:                   {t:6.2f} ms", flush=True)

    print("== 2. scatter-add sortedness ([262k,256]bf16 -> 16384 rows) ==",
          flush=True)

    def scat(u, i, sorted_flag):
        return jax.lax.scatter_add(
            jnp.zeros((R, 256), jnp.bfloat16), i[:, None], u,
            jax.lax.ScatterDimensionNumbers(
                update_window_dims=(1,), inserted_window_dims=(0,),
                scatter_dims_to_operand_dims=(0,)),
            indices_are_sorted=sorted_flag, unique_indices=False)

    t = timed(lambda u: scat(u, idx, False), upd)
    print(f"unsorted:                  {t:6.2f} ms", flush=True)
    t = timed(lambda u: scat(u, idx_sorted, True), upd)
    print(f"sorted + flag:             {t:6.2f} ms", flush=True)
    t = timed(lambda u: scat(u, idx_sorted, False), upd)
    print(f"sorted, no flag:           {t:6.2f} ms", flush=True)

    print("== 3. row width (same total bytes: N x 512 lanes / N x 256) ==",
          flush=True)
    upd512 = jax.random.normal(key, (N, 512), jnp.bfloat16)
    i8192 = jax.random.randint(jax.random.PRNGKey(2), (N,), 0, 8192)

    def scat512(u, i=i8192):
        return jnp.zeros((8192, 512), jnp.bfloat16).at[i].add(u)

    t1 = timed(scat512, upd512)
    t2 = timed(lambda u: scat(u, idx, False), upd)
    print(f"1x [262k,512] -> 8192:     {t1:6.2f} ms  (L4F8 shape)", flush=True)
    print(f"1x [262k,256] -> 16384:    {t2:6.2f} ms  (x2 for L8F4)",
          flush=True)
    upd128 = upd[:, :128]
    i32k = jax.random.randint(jax.random.PRNGKey(3), (N,), 0, 32768)

    def scat128(u, i=i32k):
        return jnp.zeros((32768, 128), jnp.bfloat16).at[i].add(u)

    t3 = timed(scat128, upd128)
    print(f"1x [262k,128] -> 32768:    {t3:6.2f} ms  (L16F2 shape)",
          flush=True)

    print("== 4. sort + permute + block-onehot-matmul + slab combine ==",
          flush=True)
    B = 1024       # samples per block
    S = 512        # slab rows covered per block (must bound block row span)

    def mm_grad(u, i):
        order = jnp.argsort(i)
        si = i[order]
        su = u[order]                                    # [N, 256] gather
        nb = N // B
        si_b = si.reshape(nb, B)
        base = si_b[:, 0]                                # block row base
        span_ok = si_b[:, -1] - base < S                 # diagnostics only
        local = si_b - base[:, None]                     # [nb, B] in [0, S)
        onehot = (local[:, :, None] ==
                  jnp.arange(S)[None, None, :]).astype(jnp.bfloat16)
        slabs = jax.lax.dot_general(
            onehot, su.reshape(nb, B, 256),
            (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [nb, S, 256]
        rows = base[:, None] + jnp.arange(S)[None, :]    # [nb, S]
        out = jnp.zeros((R, 256), jnp.float32).at[rows.reshape(-1)].add(
            slabs.reshape(-1, 256), mode="drop")
        return out, jnp.sum(span_ok)

    t = timed(lambda u: mm_grad(u, idx), upd)
    print(f"full pipeline:             {t:6.2f} ms  (vs unsorted scatter "
          f"above)", flush=True)
    _, ok = jax.jit(mm_grad)(upd, idx)
    print(f"blocks within {S}-row span: {int(ok)}/{N // B}", flush=True)

    print("== 5. N scaling of plain scatter-add ==", flush=True)
    for n in (65536, 131072, 262144):
        u = upd[:n]
        i = idx[:n]
        t = timed(lambda uu, i=i: scat_n(uu, i), u)
        print(f"N={n:7d}:                 {t:6.2f} ms", flush=True)


def scat_n(u, i):
    return jnp.zeros((16384, 256), jnp.bfloat16).at[i].add(u)


if __name__ == "__main__":
    main()
