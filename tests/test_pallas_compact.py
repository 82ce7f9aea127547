"""Interpret-mode gates for ops/pallas_compact.py vs compact_select."""

import jax.numpy as jnp
import jax.random as jr
import numpy as np
import pytest

from cednerf_tpu.engine.renderer import _compact_sel_kept, compact_select
from cednerf_tpu.ops.pallas_compact import compact_select_pallas


@pytest.mark.parametrize("r,m,budget,p", [
    (64, 128, 2048, 0.3),    # typical steady state
    (64, 128, 2048, 0.02),   # nearly empty
    (32, 256, 1024, 0.9),    # heavy overflow
    (24, 96, 512, 0.5),      # odd lattice -> small tile fallback
])
def test_compact_select_pallas_bit_exact(r, m, budget, p):
    valid = jr.uniform(jr.PRNGKey(r + m), (r, m)) < p
    sel_x, kept_x, _ = compact_select(valid, budget)
    sel_p, kept_p = compact_select_pallas(valid, budget)
    np.testing.assert_array_equal(np.asarray(sel_p), np.asarray(sel_x))
    np.testing.assert_array_equal(np.asarray(kept_p), np.asarray(kept_x))


def test_dispatch_falls_back_on_blocks():
    valid = jr.uniform(jr.PRNGKey(0), (64, 128)) < 0.4
    sel_b, kept_b, _ = compact_select(valid, 2048, n_blocks=2)
    sel_d, kept_d = _compact_sel_kept(valid, 2048, 2, "pallas")
    np.testing.assert_array_equal(np.asarray(sel_d), np.asarray(sel_b))
    np.testing.assert_array_equal(np.asarray(kept_d), np.asarray(kept_b))


def test_all_valid_and_none_valid():
    valid = jnp.ones((16, 128), bool)
    sel_p, kept_p = compact_select_pallas(valid, 1024)
    assert int(kept_p.sum()) == 1024
    assert bool((sel_p == jnp.arange(1024)).all())
    valid = jnp.zeros((16, 128), bool)
    sel_p, kept_p = compact_select_pallas(valid, 1024)
    assert int(kept_p.sum()) == 0
    assert bool((sel_p == 16 * 128).all())
