r"""Sorted multi-row Pallas search vs the XLA gather path.

Contract (same as ``engine.batch._search_tiles``): identical best similarity
for every row; identical best slot wherever a candidate exists
(``best_sim > -2``).  Where no candidate exists the slot is dead output —
the engine gates on ``best_sim > -1.5`` before using it.

Runs in interpreter mode so the kernel logic is exercised on any backend;
``make test-tpu`` compiles it for the real chip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bblean_tpu.engine.batch import _search_tiles
from bblean_tpu.ops.pallas_search2 import tile_search_sorted

# Small shapes below violate the compiled path's lane-alignment rule, so
# they always run interpreted; a separate aligned test compiles on TPU.
_INTERPRET = True


def _mk(rng, m, g, fc, f8, concentration):
    t_pk = rng.integers(0, 256, (g, fc, f8), dtype=np.uint8)
    occ = rng.random((g, fc)) < 0.7
    t_slot = np.where(occ, rng.integers(0, 10_000, (g, fc)), -1).astype(
        np.int32
    )
    t_pk[~occ] = 0
    t_pops = (
        np.unpackbits(t_pk.reshape(g * fc, f8), axis=1)
        .sum(1)
        .astype(np.int32)
        .reshape(g, fc)
    )
    row_pk = rng.integers(0, 256, (m, f8), dtype=np.uint8)
    row_pop = np.unpackbits(row_pk, axis=1).sum(1).astype(np.int32)
    if concentration == "one":
        row_group = np.zeros(m, np.int32)
    elif concentration == "spread":
        row_group = rng.integers(0, g, m).astype(np.int32)
    else:
        row_group = np.sort(rng.integers(0, 3, m)).astype(np.int32)
    pending = rng.random(m) < 0.8
    return (
        jnp.asarray(row_pk),
        jnp.asarray(row_pop),
        jnp.asarray(row_group),
        jnp.asarray(t_pk),
        jnp.asarray(t_pops),
        jnp.asarray(t_slot),
        jnp.asarray(pending),
    )


@pytest.mark.parametrize(
    "m,g,fc,f8,concentration",
    [
        (64, 8, 16, 32, "one"),  # merge-heavy: every row one group
        (64, 8, 16, 32, "few"),
        (64, 8, 16, 32, "spread"),  # singleton-heavy: 1-2 rows per group
        (128, 32, 8, 8, "spread"),
        (256, 4, 32, 32, "few"),
    ],
)
def test_sorted_search_matches_xla(m, g, fc, f8, concentration) -> None:
    rng = np.random.default_rng(m + g + fc)
    args = _mk(rng, m, g, fc, f8, concentration)
    ref_sim, ref_slot = jax.block_until_ready(_search_tiles(*args))
    got_sim, got_slot = jax.block_until_ready(
        tile_search_sorted(*args, interpret=_INTERPRET)
    )
    ref_sim = np.asarray(ref_sim)
    np.testing.assert_array_equal(ref_sim, np.asarray(got_sim))
    has_cand = ref_sim > -1.5
    np.testing.assert_array_equal(
        np.asarray(ref_slot)[has_cand], np.asarray(got_slot)[has_cand]
    )


def test_sorted_search_all_empty_tiles() -> None:
    r"""Empty tiles everywhere -> sim -2, slot clamped to 0."""
    m, g, fc, f8 = 32, 4, 8, 16
    rng = np.random.default_rng(0)
    args = list(_mk(rng, m, g, fc, f8, "spread"))
    args[5] = jnp.full((g, fc), -1, jnp.int32)  # no live slots
    got_sim, got_slot = tile_search_sorted(*args, interpret=_INTERPRET)
    assert (np.asarray(got_sim) == -2.0).all()
    assert (np.asarray(got_slot) == 0).all()


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="compiled Mosaic path needs a TPU"
)
def test_sorted_search_compiled_on_tpu() -> None:
    r"""Aligned production-like shapes, compiled for the real chip."""
    rng = np.random.default_rng(7)
    args = _mk(rng, 512, 16, 128, 256, "spread")
    ref_sim, ref_slot = jax.block_until_ready(_search_tiles(*args))
    got_sim, got_slot = jax.block_until_ready(tile_search_sorted(*args))
    ref_sim = np.asarray(ref_sim)
    np.testing.assert_array_equal(ref_sim, np.asarray(got_sim))
    has_cand = ref_sim > -1.5
    np.testing.assert_array_equal(
        np.asarray(ref_slot)[has_cand], np.asarray(got_slot)[has_cand]
    )


def test_sorted_search_rejects_misaligned_compiled() -> None:
    rng = np.random.default_rng(3)
    args = _mk(rng, 64, 8, 16, 32, "few")
    with pytest.raises(ValueError, match="Fc % 128"):
        tile_search_sorted(*args, interpret=False)


def test_sorted_search_guard_group_path() -> None:
    r"""The engine-integration path (``guard_group=<reserved tile>``, no
    table append) must match both the XLA search and the append-guard
    variant — this is the only path ``use_pallas_search=True`` runs."""
    m, g, fc, f8 = 64, 8, 16, 32
    rng = np.random.default_rng(11)
    args = list(_mk(rng, m, g, fc, f8, "few"))
    # Reserve the last tile as the guard, like the engine's state does
    t_pk = np.asarray(args[3]).copy()
    t_slot = np.asarray(args[5]).copy()
    t_pk[g - 1] = 0
    t_slot[g - 1] = -1
    args[3] = jnp.asarray(t_pk)
    args[5] = jnp.asarray(t_slot)
    row_group = jnp.minimum(args[2], g - 2)  # never route to the guard
    args[2] = row_group
    ref_sim, ref_slot = _search_tiles(*args)
    got_sim, got_slot = tile_search_sorted(
        *args, interpret=_INTERPRET, guard_group=g - 1
    )
    app_sim, app_slot = tile_search_sorted(*args, interpret=_INTERPRET)
    ref_sim = np.asarray(ref_sim)
    np.testing.assert_array_equal(ref_sim, np.asarray(got_sim))
    np.testing.assert_array_equal(ref_sim, np.asarray(app_sim))
    has_cand = ref_sim > -1.5
    np.testing.assert_array_equal(
        np.asarray(ref_slot)[has_cand], np.asarray(got_slot)[has_cand]
    )


def test_engine_pallas_search_small_configs_fall_back() -> None:
    r"""use_pallas_search with misaligned shapes (small batch, narrow retry
    windows, odd tiles) must transparently fall back to the XLA search
    instead of raising (regression: the sorted kernel's alignment check
    fired at trace time for batch_size=128)."""
    from bblean_tpu.engine.batch import BatchTree
    from bblean_tpu.fingerprints import make_fake_fingerprints

    fps = make_fake_fingerprints(400, seed=9)
    a = BatchTree(2048, threshold=0.3, batch_size=128, initial_capacity=1024)
    a.fit_packed(fps, range(400))
    b = BatchTree(
        2048, threshold=0.3, batch_size=128, initial_capacity=1024,
        use_pallas_search=True,
    )
    b.fit_packed(fps, range(400))
    assert a.num_clusters == b.num_clusters
    assert a.cluster_mols() == b.cluster_mols()


def test_planned_search_with_stale_plan_matches_xla() -> None:
    r"""The engine computes the sort plan ONCE per step (rows keyed by
    their step-constant routed group with the initial pending mask) and
    reuses it across rounds while ``pending`` shrinks — rows assigned in
    earlier rounds are scored against their group then masked.  The
    planned call with a stale plan must match the XLA search evaluated at
    the CURRENT pending mask."""
    from bblean_tpu.ops.pallas_search2 import (
        sorted_search_plan,
        tile_search_planned,
    )

    m, g, fc, f8 = 64, 8, 16, 32
    rng = np.random.default_rng(23)
    args = list(_mk(rng, m, g, fc, f8, "few"))
    row_pk, row_pop, row_group, t_pk, t_pops, t_slot, _pending = args
    # Reserve the last tile as the engine's guard
    t_pk = np.asarray(t_pk).copy()
    t_slot = np.asarray(t_slot).copy()
    t_pk[g - 1] = 0
    t_slot[g - 1] = -1
    t_pops = (
        np.unpackbits(t_pk.reshape(g * fc, f8), axis=1)
        .sum(1)
        .astype(np.int32)
        .reshape(g, fc)
    )
    t_pk, t_pops, t_slot = map(jnp.asarray, (t_pk, t_pops, t_slot))
    guard = g - 1
    pending0 = np.ones(m, bool)
    pending0[::7] = False  # padding rows, keyed to guard at plan time
    key = jnp.where(jnp.asarray(pending0), row_group, guard)
    order, skey, nxt = sorted_search_plan(key, guard)
    srows, spops = row_pk[order], row_pop[order]

    # Round 2: a third of the initially-pending rows have been assigned
    pending_now = pending0.copy()
    pending_now[1::3] = False
    pend = jnp.asarray(pending_now)
    got_sim, got_slot = jax.block_until_ready(
        tile_search_planned(
            srows, spops, skey, nxt, order, t_pk, t_pops, t_slot, pend,
            guard_group=guard, interpret=_INTERPRET,
        )
    )
    ref_sim, ref_slot = jax.block_until_ready(
        _search_tiles(row_pk, row_pop, row_group, t_pk, t_pops, t_slot, pend)
    )
    ref_sim = np.asarray(ref_sim)
    np.testing.assert_array_equal(ref_sim, np.asarray(got_sim))
    has_cand = ref_sim > -1.5
    np.testing.assert_array_equal(
        np.asarray(ref_slot)[has_cand], np.asarray(got_slot)[has_cand]
    )
