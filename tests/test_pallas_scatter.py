"""scatter_add_rows / scatter_add_onehot must match jnp .at[].add exactly
(f32 accumulation; bf16 accumulation matches a bf16 .at[].add reference).
Pallas runs in interpret mode here (CPU test mesh)."""

import numpy as np
import jax
import jax.numpy as jnp

from cednerf_tpu.ops.pallas_scatter import scatter_add_onehot, scatter_add_rows


def _case(key, n=8192, w=256, n_rows=512):
    kr, ku = jax.random.split(key)
    rows = jax.random.randint(kr, (n,), 0, n_rows)
    upd = jax.random.normal(ku, (n, w), jnp.float32).astype(jnp.bfloat16)
    return rows, upd


def test_scatter_add_rows_matches_xla_f32():
    rows, upd = _case(jax.random.PRNGKey(0))
    ref = jnp.zeros((512, 256), jnp.float32).at[rows].add(
        upd.astype(jnp.float32))
    out = scatter_add_rows(rows, upd, n_rows=512, accum_dtype=jnp.float32,
                           tile=1024, unroll=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_scatter_add_rows_collision_heavy():
    # ray-coherent worst case: long runs of identical rows
    n, w, n_rows = 4096, 128, 64
    rows = (jnp.arange(n) // 64).astype(jnp.int32) % n_rows
    upd = jnp.ones((n, w), jnp.bfloat16)
    ref = jnp.zeros((n_rows, w), jnp.float32).at[rows].add(
        upd.astype(jnp.float32))
    out = scatter_add_rows(rows, upd, n_rows=n_rows, tile=512, unroll=4,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=0)


def test_scatter_add_onehot_matches_xla():
    rows, upd = _case(jax.random.PRNGKey(2), n_rows=216)
    ref = jnp.zeros((216, 256), jnp.float32).at[rows].add(
        upd.astype(jnp.float32))
    out = scatter_add_onehot(rows, upd, n_rows=216, block=2048)
    # bf16 one-hot matmul accumulates the products in f32 on the MXU but
    # the bf16 inputs themselves are exact here (upd already bf16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-4)


def test_scatter_add_rows_unaligned_table():
    # dense levels have non-multiple-of-8 row counts (e.g. 17^3 = 4913);
    # the kernel pads the accumulator to the aligned-window granule and
    # slices it back — incl. rows in the final partial window
    n, w, n_rows = 2048, 128, 339
    key = jax.random.PRNGKey(3)
    kr, ku = jax.random.split(key)
    rows = jnp.concatenate([
        jax.random.randint(kr, (n - 4,), 0, n_rows),
        jnp.full((4,), n_rows - 1, jnp.int32),  # hit the last row
    ])
    upd = jax.random.normal(ku, (n, w), jnp.float32)
    ref = jnp.zeros((n_rows, w), jnp.float32).at[rows].add(upd)
    out = scatter_add_rows(rows, upd, n_rows=n_rows,
                           accum_dtype=jnp.float32, tile=512,
                           interpret=True)
    assert out.shape == (n_rows, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)
