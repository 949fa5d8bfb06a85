r"""Pool-leak telemetry: the ``fits_g`` kill path must be visible.

The in-step group-capacity guard can kill a multi-member creation AFTER its
pool ref was consumed by the allocation cumsum (``engine/batch.py``, the
``create_pool`` kill site) — a documented, bounded leak.  These tests hammer
that path deliberately (group headroom forced to zero + a window whose
creations must overflow the group table) and assert that

1. the engine still clusters correctly (kills pend + retry at boundaries),
2. ``BatchTree.pool_dead_rows`` counts the leaked rows (> 0 here), and
3. repeated recluster loops cannot exhaust the pool invisibly: the dead
   count stays bounded by the kills, and capacity accounting (``num_ls``
   includes dead rows) keeps growth correct.
"""

import numpy as np
import pytest

from bblean_tpu.engine.batch import BatchTree


def _paired_fps(n_distinct: int, seed: int = 7) -> np.ndarray:
    r"""``n_distinct`` random packed fps, each duplicated adjacently so the
    duplicate lands in the SAME batch (joint multi-member creation =>
    a pool ref per pair)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, size=(n_distinct, 256), dtype=np.uint8)
    return np.repeat(base, 2, axis=0)


def test_pool_dead_rows_zero_on_clean_run() -> None:
    fps = _paired_fps(512)
    tree = BatchTree(2048, threshold=0.99, batch_size=256)
    tree.fit_packed(fps, range(len(fps)))
    assert tree.num_clusters == 512
    assert tree.cluster_sizes().sum() == len(fps)
    # Ample capacity: no kills, no leaks
    assert tree.pool_dead_rows == 0


def test_pool_leak_counted_on_group_kill_path() -> None:
    n_distinct = 8192
    fps = _paired_fps(n_distinct)
    tree = BatchTree(
        2048,
        threshold=0.99,
        batch_size=1024,
        fanout=48,
        tile=64,
        g_capacity=64,  # far below the ~170 groups the window discovers
        initial_capacity=1 << 15,
        ls_capacity=1 << 15,  # pool never kills; only the group guard does
    )
    tree.scan_batches = 16  # one big window outruns the group table
    # Disable the proactive group headroom so in-window creations MUST hit
    # the in-step guard (the public path pre-grows and makes kills rare)
    tree._scan_g_headroom = lambda: 0  # type: ignore[method-assign]
    tree.fit_packed(fps, range(len(fps)))

    # Correctness survives the kills: every pair ends as one cluster of 2
    assert tree.num_clusters == n_distinct
    sizes = tree.cluster_sizes()
    assert sizes.sum() == len(fps)
    assert (sizes == 2).all()

    dead = tree.pool_dead_rows
    assert dead > 0, "kill path did not trigger; telemetry untested"
    # Bounded: can never exceed the pool counter, and the accounting
    # identity (num_ls == live refs + dead) holds by construction
    num_ls = int(tree.state.num_ls)
    assert 0 < dead <= num_ls

    # Long recluster loops stay visible + bounded: reclustering re-inserts
    # CF rows through the same step; dead rows may grow, never shrink the
    # live accounting below what extraction needs
    tree.recluster_inplace()
    assert tree.cluster_sizes().sum() == len(fps)
    assert tree.pool_dead_rows >= 0


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
