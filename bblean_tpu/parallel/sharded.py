r"""SPMD sharded clustering: per-device tree builds + ICI all-gather merge.

Re-design of the reference's multiround pipeline (``bblean/multiround.py``):
the reference fans out one process per ``.npy`` shard, dumps CF buffers to
disk, and re-clusters file batches over several rounds; here the entire
pipeline is ONE compiled SPMD program over a ``Mesh``:

- **Initial round** == each device scans its local fingerprint shard through
  the batched engine rounds (``engine/batch.py``), producing a per-device CF
  table (this is the reference's ``_InitialRound``, ``multiround.py:146-216``,
  without processes).
- **Exchange** == ``lax.all_gather`` of the CF tables over the mesh axis —
  the ICI replacement for ``round-*-bufs*.npy`` files on disk
  (``multiround.py:132-143``).
- **Merge round** == every device re-inserts the gathered CF rows (ordered
  largest-first, mirroring the uint16-before-uint8 heuristic of
  ``multiround.py:104-111``) into a fresh table; the result is replicated, so
  no broadcast is needed (this is ``_FinalTreeMergingRound``).

Capacities are static per compilation: ``capacity`` bounds clusters per
device (safe upper bound: the local row count), ``merge_capacity`` bounds the
final cluster count.  The host wrapper composes global labels from the two
assignment levels.
"""

from __future__ import annotations

import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array, lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bblean_tpu.engine.batch import BatchState, _batch_step_impl, _init_state
from bblean_tpu.ops.isim import majority_centroid_from_sums
from bblean_tpu.ops.packing import pack_fingerprints_device

__all__ = ["sharded_fit", "ShardedClusters"]


class ShardedClusters(tp.NamedTuple):
    r"""Result of a sharded fit (host-side)."""

    labels: np.ndarray  # (N,) final cluster slot per input row
    linear_sums: np.ndarray  # (C, F) merged cluster linear sums
    sizes: np.ndarray  # (C,) merged cluster sizes
    num_clusters: int


def _scan_insert(
    state: BatchState,
    fps_batches: Array,  # (B, M, F)
    valid_batches: Array,  # (B, M) bool (False = shard padding)
    threshold: Array,
    tolerance: Array,
    criterion: str,
    block: int,
    max_rounds: int,
) -> tuple[BatchState, Array]:
    def body(state, batch):
        batch_fps, valid = batch
        row_ls = batch_fps.astype(jnp.int32)
        row_n = valid.astype(jnp.int32)
        row_cent = batch_fps.astype(jnp.bfloat16)
        row_pk = pack_fingerprints_device(batch_fps)
        row_pop = jnp.sum(row_ls, axis=-1)
        state, assigned, _pending = _batch_step_impl(
            state, row_ls, row_n, row_cent, row_pk, row_pop, threshold,
            tolerance, criterion=criterion, block=block,
            max_rounds=max_rounds,
        )
        return state, assigned

    state, assigned = lax.scan(body, state, (fps_batches, valid_batches))
    return state, assigned.reshape(-1)


def _scan_insert_buffers(
    state: BatchState,
    ls_batches: Array,  # (B, M, F) int32
    n_batches: Array,  # (B, M) int32
    threshold: Array,
    tolerance: Array,
    criterion: str,
    block: int,
    max_rounds: int,
) -> tuple[BatchState, Array]:
    def body(state, batch):
        row_ls, row_n = batch
        cent = majority_centroid_from_sums(row_ls, jnp.maximum(row_n, 1))
        row_pk = pack_fingerprints_device(cent)
        row_pop = jnp.sum(cent.astype(jnp.int32), axis=-1)
        state, assigned, _pending = _batch_step_impl(
            state, row_ls, row_n, cent.astype(jnp.bfloat16), row_pk, row_pop,
            threshold, tolerance, criterion=criterion, block=block,
            max_rounds=max_rounds,
        )
        return state, assigned

    state, assigned = lax.scan(body, state, (ls_batches, n_batches))
    return state, assigned.reshape(-1)


def sharded_fit(
    fps_unpacked: np.ndarray,
    mesh: Mesh,
    *,
    threshold: float = 0.65,
    merge_criterion: str = "diameter",
    tolerance: float = 0.05,
    batch_size: int = 256,
    capacity: int | None = None,
    g_capacity: int | None = None,
    merge_capacity: int | None = None,
    tile: int = 256,
    centroid_block: int = 512,
    max_rounds: int = 16,
    axis_name: str = "dp",
) -> ShardedClusters:
    r"""Cluster fingerprints data-parallel over a device mesh.

    ``fps_unpacked`` is padded to a multiple of ``n_devices * batch_size``
    with zero rows (ignored).  Returns merged (replicated) clusters plus a
    per-input-row label composed from the local and merge assignments.
    """
    n_dev = mesh.devices.size
    n, f = fps_unpacked.shape

    per_dev = -(-n // (n_dev * batch_size)) * batch_size
    padded = np.zeros((n_dev * per_dev, f), dtype=np.uint8)
    padded[:n] = fps_unpacked
    n_batches = per_dev // batch_size

    if capacity is None:
        capacity = per_dev + batch_size + 1
    cap = _next_pow2(capacity)
    merge_cap = _next_pow2(
        merge_capacity if merge_capacity is not None else n_dev * cap + 1
    )
    # Groups are opened device-side on tile overflow; bound by cluster count
    g_cap = _next_pow2(g_capacity if g_capacity is not None else cap + 2)
    g_cap_merge = _next_pow2(merge_cap + 2)
    block = min(centroid_block, cap)
    merge_block = min(centroid_block, merge_cap)
    merge_batch = batch_size

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=P(axis_name),
        out_specs=(P(axis_name), P(), P(), P()),
        check_vma=False,
    )
    def run(local_fps):  # (per_dev, F) on each device
        threshold_ = jnp.float32(threshold)
        tolerance_ = jnp.float32(tolerance)
        state = _init_state(cap, g_cap, tile, f)
        # Validity from global row index (supports genuinely all-zero fps)
        my_base = lax.axis_index(axis_name) * per_dev
        local_idx = my_base + jnp.arange(per_dev, dtype=jnp.int32)
        valid = (local_idx < n).reshape(n_batches, batch_size)
        batches = local_fps.reshape(n_batches, batch_size, f)
        state, local_assigned = _scan_insert(
            state, batches, valid, threshold_, tolerance_, merge_criterion,
            block, max_rounds,
        )

        # --- CF exchange over ICI: gather every device's cluster table ---
        all_ls = lax.all_gather(state.ls, axis_name)  # (D, cap, F)
        all_n = lax.all_gather(state.n, axis_name)  # (D, cap)
        n_rows = n_dev * cap
        gathered_ls = all_ls.reshape(n_rows, f)
        gathered_n = all_n.reshape(n_rows)

        # Largest-clusters-first ordering (the batched analogue of
        # multiround's uint16-before-uint8 file ordering); empty slots sink
        order = jnp.argsort(-gathered_n, stable=True)
        sorted_ls = gathered_ls[order]
        sorted_n = gathered_n[order]

        # --- merge round (replicated on all devices) ---
        m_state = _init_state(merge_cap, g_cap_merge, tile, f)
        n_mbatches = -(-n_rows // merge_batch)
        pad_rows = n_mbatches * merge_batch - n_rows
        sorted_ls = jnp.pad(sorted_ls, ((0, pad_rows), (0, 0)))
        sorted_n = jnp.pad(sorted_n, (0, pad_rows))
        m_state, m_assigned_sorted = _scan_insert_buffers(
            m_state,
            sorted_ls.reshape(n_mbatches, merge_batch, f),
            sorted_n.reshape(n_mbatches, merge_batch),
            threshold_, tolerance_, merge_criterion, merge_block, max_rounds,
        )
        # Un-sort the merge assignments back to (device, slot) order
        m_assigned = (
            jnp.zeros((n_rows,), jnp.int32)
            .at[order]
            .set(m_assigned_sorted[:n_rows])
        )

        return (
            local_assigned[None],  # (1, per_dev) per-device
            m_assigned,  # replicated: (D*cap,) merge slot per gathered row
            m_state.ls,  # replicated merged tables
            m_state.n,
        )

    local_assigned, m_assigned, merged_ls, merged_n = run(jnp.asarray(padded))

    local_assigned = np.asarray(local_assigned).reshape(n_dev, per_dev)
    m_assigned = np.asarray(m_assigned)
    merged_ls = np.asarray(merged_ls)
    merged_n = np.asarray(merged_n)

    # Compose: input row -> (device, local slot) -> merged slot
    labels = np.empty(n, dtype=np.int64)
    for d in range(n_dev):
        lo = d * per_dev
        hi = min((d + 1) * per_dev, n)
        if lo >= n:
            break
        local = local_assigned[d, : hi - lo]
        labels[lo:hi] = m_assigned[d * cap + local]

    num = int((merged_n > 0).sum())
    live = np.nonzero(merged_n > 0)[0]
    # Compact merged slots to a dense range
    remap = np.full(len(merged_n), -1, dtype=np.int64)
    remap[live] = np.arange(num)
    return ShardedClusters(
        labels=remap[labels],
        linear_sums=merged_ls[live],
        sizes=merged_n[live],
        num_clusters=num,
    )


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p
