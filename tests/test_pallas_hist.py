"""Pallas histogram kernel vs scatter-add reference (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from argon_monte_carlo_tpu.ops.pallas_hist import histogram_804


def test_pallas_histogram_matches_scatter():
    key = jax.random.PRNGKey(0)
    n, bins = 10_000, 804
    k1, k2 = jax.random.split(key)
    ids = jax.random.randint(k1, (n,), 0, bins)
    w = (jax.random.uniform(k2, (n,)) < 0.3).astype(jnp.float32)
    got = histogram_804(ids, w, bins, tile=1024, interpret=True)
    want = jnp.zeros((bins,), jnp.float32).at[ids].add(w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_pallas_histogram_drops_out_of_range():
    ids = jnp.asarray([0, 5, 803, -1, 9000], jnp.int32)
    w = jnp.ones((5,), jnp.float32)
    got = histogram_804(ids, w, 804, tile=8, interpret=True)
    assert float(got.sum()) == 3.0
    assert float(got[0]) == 1.0 and float(got[5]) == 1.0
    assert float(got[803]) == 1.0
