r"""Pallas fused in-group search vs the jnp reference path (interpret mode on
CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import bblean_tpu.engine.batch as B
from bblean_tpu.ops.pallas_search import tile_search_pallas


def _random_state(key, m=32, g=8, fc=16, f8=32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    t_pk = jax.random.randint(k1, (g, fc, f8), 0, 256, jnp.int32).astype(
        jnp.uint8
    )
    t_pops = jnp.sum(jax.lax.population_count(t_pk.astype(jnp.int32)), -1)
    t_slot = jnp.where(
        jax.random.uniform(k2, (g, fc)) < 0.6,
        jax.lax.broadcasted_iota(jnp.int32, (g, fc), 1),
        -1,
    )
    row_pk = jax.random.randint(k3, (m, f8), 0, 256, jnp.int32).astype(
        jnp.uint8
    )
    row_pop = jnp.sum(jax.lax.population_count(row_pk.astype(jnp.int32)), -1)
    row_group = jax.random.randint(k4, (m,), 0, g, jnp.int32)
    pending = jnp.ones((m,), bool)
    return row_pk, row_pop, row_group, t_pk, t_pops, t_slot, pending


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_matches_jnp(seed) -> None:
    args = _random_state(jax.random.PRNGKey(seed))
    ps, psl = tile_search_pallas(*args, interpret=True)
    js, jsl = B._search_tiles(*args)
    assert np.allclose(np.asarray(ps), np.asarray(js), atol=1e-6)
    assert (np.asarray(psl) == np.asarray(jsl)).all()


def test_pallas_pending_mask() -> None:
    args = list(_random_state(jax.random.PRNGKey(3)))
    pending = np.ones(32, bool)
    pending[::2] = False
    args[-1] = jnp.asarray(pending)
    ps, _ = tile_search_pallas(*args, interpret=True)
    assert (np.asarray(ps)[::2] == -2.0).all()


def test_pallas_empty_tiles() -> None:
    args = list(_random_state(jax.random.PRNGKey(4)))
    args[5] = jnp.full_like(args[5], -1)  # all tile cells empty
    ps, _ = tile_search_pallas(*args, interpret=True)
    assert (np.asarray(ps) == -2.0).all()
