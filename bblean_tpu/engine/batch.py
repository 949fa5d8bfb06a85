r"""TPU-native level-synchronous batched BitBirch engine.

This is the performance path of the framework — the structural re-design of
the reference's pointer-chasing recursive insert (``bblean/bitbirch.py:305-357``)
for TPU hardware.  The CF-tree is flattened to **depth 2** and stored as flat
device arrays:

- **groups** (the analogue of the reference's internal-node entries): CF
  tables ``(G, F)`` holding the aggregate linear sum / count / majority
  centroid of all clusters under them;
- **clusters** (the leaf subclusters): CF tables ``(C, F)`` plus a
  ``cluster_group`` id vector tying each cluster to its group.

Each jitted round of a batch step:

1. routes every row to a group by argmax Tanimoto over group centroids (one
   MXU matmul) — the batched analogue of the recursive descent;
2. searches only the clusters *of that group* (full-table matmul with an
   in-group mask; block-sparse search is the planned optimization) — the
   analogue of the leaf-node argmax;
3. batch-evaluates the merge criterion, committing whole conflict groups when
   the merged CF still satisfies the criterion, else only the lowest-index
   row (serial order), and
4. runs a per-group leader election so mutually-similar rejected rows open
   one shared new cluster instead of M duplicates.  Rows that lose retry next
   round against the updated state until the batch drains.

Topology changes run on **host between steps** (the control plane): a group
whose cluster count exceeds the fan-out limit is split by the same
most-dissimilar-pair partition the reference uses for node splits
(``bblean/bitbirch.py:162-211``), implemented over cluster centroids with the
host kernels.  This keeps all data-plane math static-shaped and jittable
while the (rare, cheap) data-dependent restructuring stays in NumPy.

Without the depth-2 locality a flat global argmax degenerates at low
thresholds into a few giant just-above-threshold clusters; the grouped
search reproduces the serial tree's cluster-size structure.

Semantics: same merge criteria, thresholds and CF arithmetic as the exact
engine, evaluated in float32 on device.  Labels are near-serial but not
bit-identical — use the exact engine when reference-identical labels are
required.  Cohesion invariants (every committed cluster satisfies its merge
criterion) hold by construction because group commits re-check the criterion
on the merged state.

Buffer-mode rows (pre-aggregated CFs with n > 1) flow through the same step,
which is what the sharded / multiround merge rounds use.
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array, lax

from bblean_tpu._np_similarity import (
    _jt_sim_packed_precalc_cardinalities,
    centroid_from_sum,
    popcount,
)
from bblean_tpu.ops.isim import majority_centroid_from_sums
from bblean_tpu.ops.merges import merge_accept_batch

__all__ = ["BatchTree", "BatchState"]

_NEG = -2.0  # below any similarity


class BatchState(tp.NamedTuple):
    r"""Device-side depth-2 CF-tree (capacity-padded flat tables)."""

    # Leaf clusters
    ls: Array  # (C_cap, F) int32 linear sums
    n: Array  # (C_cap,) int32 sizes (0 = empty slot)
    cent: Array  # (C_cap, F) bfloat16 majority centroids (0/1)
    pops: Array  # (C_cap,) int32 centroid popcounts
    group: Array  # (C_cap,) int32 owning group id
    num: Array  # () int32 live clusters
    # Groups (internal level)
    g_ls: Array  # (G_cap, F) int32
    g_n: Array  # (G_cap,) int32 total samples under the group
    g_cent: Array  # (G_cap, F) bfloat16
    g_pops: Array  # (G_cap,) int32
    g_count: Array  # (G_cap,) int32 clusters in the group
    g_num: Array  # () int32 live groups


def _init_state(capacity: int, g_capacity: int, n_features: int) -> BatchState:
    return BatchState(
        ls=jnp.zeros((capacity, n_features), dtype=jnp.int32),
        n=jnp.zeros((capacity,), dtype=jnp.int32),
        cent=jnp.zeros((capacity, n_features), dtype=jnp.bfloat16),
        pops=jnp.zeros((capacity,), dtype=jnp.int32),
        group=jnp.zeros((capacity,), dtype=jnp.int32),
        num=jnp.zeros((), dtype=jnp.int32),
        g_ls=jnp.zeros((g_capacity, n_features), dtype=jnp.int32),
        g_n=jnp.zeros((g_capacity,), dtype=jnp.int32),
        g_cent=jnp.zeros((g_capacity, n_features), dtype=jnp.bfloat16),
        g_pops=jnp.zeros((g_capacity,), dtype=jnp.int32),
        g_count=jnp.zeros((g_capacity,), dtype=jnp.int32),
        g_num=jnp.ones((), dtype=jnp.int32),  # group 0 exists (empty root)
    )


def _grow_state(state: BatchState, new_c: int, new_g: int) -> BatchState:
    pad_c = new_c - state.ls.shape[0]
    pad_g = new_g - state.g_ls.shape[0]
    return BatchState(
        ls=jnp.pad(state.ls, ((0, pad_c), (0, 0))),
        n=jnp.pad(state.n, (0, pad_c)),
        cent=jnp.pad(state.cent, ((0, pad_c), (0, 0))),
        pops=jnp.pad(state.pops, (0, pad_c)),
        group=jnp.pad(state.group, (0, pad_c)),
        num=state.num,
        g_ls=jnp.pad(state.g_ls, ((0, pad_g), (0, 0))),
        g_n=jnp.pad(state.g_n, (0, pad_g)),
        g_cent=jnp.pad(state.g_cent, ((0, pad_g), (0, 0))),
        g_pops=jnp.pad(state.g_pops, (0, pad_g)),
        g_count=jnp.pad(state.g_count, (0, pad_g)),
        g_num=state.g_num,
    )


def _masked_tanimoto_best(
    row_cent: Array,  # (M, F) bf16
    row_pop: Array,  # (M,) int32
    cent: Array,  # (C, F) bf16
    pops: Array,  # (C,) int32
    col_live: tp.Callable[[Array], Array],  # (cols) -> bool mask
    row_ok: Array,  # (M,) bool rows to score at all
    block: int,
    extra_col_mask: tp.Callable[[Array], Array] | None = None,
    row_col_mask: tp.Callable[[Array], Array] | None = None,
) -> tuple[Array, Array]:
    r"""Tiled masked argmax Tanimoto of rows vs columns (MXU per block).

    ``row_col_mask(cols)`` may provide a per-(row, column-block) mask of shape
    (M, block).  Returns (best_sim, best_idx) with best_sim = -2 where no
    column qualifies.
    """
    m = row_cent.shape[0]
    c = cent.shape[0]
    n_blocks = c // block

    def body(b, carry):
        best_sim, best_idx = carry
        start = b * block
        cb = lax.dynamic_slice_in_dim(cent, start, block, axis=0)
        pb = lax.dynamic_slice_in_dim(pops, start, block, axis=0)
        inter = lax.dot_general(
            row_cent, cb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        union = (row_pop[:, None] + pb[None, :]).astype(jnp.float32) - inter
        sims = inter / jnp.maximum(union, 1.0)
        cols = start + lax.broadcasted_iota(jnp.int32, (m, block), 1)
        mask = col_live(cols) & row_ok[:, None]
        if row_col_mask is not None:
            mask = mask & row_col_mask(cols)
        sims = jnp.where(mask, sims, _NEG)
        blk_best = jnp.max(sims, axis=1)
        blk_idx = start + jnp.argmax(sims, axis=1).astype(jnp.int32)
        take = blk_best > best_sim
        return (
            jnp.where(take, blk_best, best_sim),
            jnp.where(take, blk_idx, best_idx),
        )

    init = (jnp.full((m,), _NEG, jnp.float32), jnp.zeros((m,), jnp.int32))
    return lax.fori_loop(0, n_blocks, body, init)


def _group_ids_by_key(key: Array) -> tuple[Array, Array, Array]:
    r"""Stable grouping of rows by an int key.

    Returns (order, group_of_sorted, is_group_start): ``order`` sorts rows by
    (key, index); equal keys form one group.
    """
    order = jnp.argsort(key, stable=True)
    sorted_key = key[order]
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_key[1:] != sorted_key[:-1]]
    )
    group = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    return order, group, is_start


@functools.partial(
    jax.jit,
    static_argnames=("criterion", "block", "max_rounds"),
    donate_argnums=(0,),
)
def _batch_step(
    state: BatchState,
    row_ls: Array,  # (M, F) int32
    row_n: Array,  # (M,) int32 (0 rows are padding)
    row_cent: Array,  # (M, F) bf16
    row_pop: Array,  # (M,) int32
    threshold: Array,  # () f32
    tolerance: Array,  # () f32
    *,
    criterion: str,
    block: int,
    max_rounds: int,
) -> tuple[BatchState, Array]:
    r"""Insert one batch of CF rows; returns (state, assigned slot per row)."""
    m, _f = row_ls.shape
    big = jnp.int32(1 << 30)
    row_idx = lax.broadcasted_iota(jnp.int32, (m, 1), 0)[:, 0]
    guard_c = state.ls.shape[0] - 1  # scratch slot for masked scatters

    def cond(carry):
        _state, pending, _assigned, _rg, r = carry
        return (r < max_rounds) & jnp.any(pending)

    def round_body(carry):
        state, pending, assigned, _last_rg, r = carry

        # ---- 1. descend: route each row to a group ----
        _gsim, row_group = _masked_tanimoto_best(
            row_cent, row_pop, state.g_cent, state.g_pops,
            col_live=lambda cols: cols < state.g_num,
            row_ok=pending,
            block=min(block, state.g_cent.shape[0]),
        )
        row_group = jnp.where(pending, row_group, 0)

        # ---- 2. leaf search restricted to the routed group ----
        cluster_group = state.group
        best_sim, best = _masked_tanimoto_best(
            row_cent, row_pop, state.cent, state.pops,
            col_live=lambda cols: cols < state.num,
            row_ok=pending,
            block=block,
            row_col_mask=lambda cols: cluster_group[cols] == row_group[:, None],
        )
        has_cand = best_sim > -1.5

        # ---- 3. individual merge evaluation ----
        cand_ls = state.ls[best]
        cand_n = state.n[best]
        accept = merge_accept_batch(
            criterion, threshold, cand_ls + row_ls, cand_n + row_n, cand_ls,
            cand_n, row_n, tolerance=tolerance,
        )
        accept = accept & pending & has_cand

        # ---- conflict groups among accepted rows (same candidate) ----
        akey = jnp.where(accept, best, big)
        aorder, agrp, astart = _group_ids_by_key(akey)
        a_ok = accept[aorder]
        s_ls = jnp.where(a_ok[:, None], row_ls[aorder], 0)
        s_n = jnp.where(a_ok, row_n[aorder], 0)
        gsum_ls = jax.ops.segment_sum(s_ls, agrp, num_segments=m)
        gsum_n = jax.ops.segment_sum(s_n, agrp, num_segments=m)
        gcand = jax.ops.segment_max(
            jnp.where(a_ok, best[aorder], 0), agrp, num_segments=m
        )
        gvalid = jax.ops.segment_max(
            a_ok.astype(jnp.int32), agrp, num_segments=m
        ).astype(bool)
        gc_ls = state.ls[gcand]
        gc_n = state.n[gcand]
        gaccept = (
            merge_accept_batch(
                criterion, threshold, gc_ls + gsum_ls, gc_n + gsum_n, gc_ls,
                gc_n, gsum_n, tolerance=tolerance,
            )
            & gvalid
        )
        winner = jnp.zeros((m,), bool).at[aorder].set(astart & a_ok)
        group_ok = jnp.zeros((m,), bool).at[aorder].set(gaccept[agrp])
        merge_commit = accept & (group_ok | winner)

        # ---- 4. leader election among rejected rows (per routed group) ----
        rejected = pending & ~accept
        if criterion == "never-merge":
            leader = rejected
            join = jnp.zeros((m,), bool)
            lead_of = row_idx
        else:
            rcent = jnp.where(rejected[:, None], row_cent, 0)
            rsims = lax.dot_general(
                rcent, rcent, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            rpop = jnp.where(rejected, row_pop, 0)
            runion = rpop[:, None] + rpop[None, :] - rsims
            rsims = rsims / jnp.maximum(runion, 1.0)
            same_group = row_group[:, None] == row_group[None, :]
            lower = row_idx[None, :] < row_idx[:, None]  # [j, i]: i < j
            sim_to_lower = jnp.where(
                lower & rejected[None, :] & same_group, rsims, _NEG
            )
            leads = rejected & ~jnp.any(sim_to_lower >= threshold, axis=1)
            sim_to_leader = jnp.where(leads[None, :], sim_to_lower, _NEG)
            lead_of = jnp.argmax(sim_to_leader, axis=1).astype(jnp.int32)
            best_lead_sim = jnp.max(sim_to_leader, axis=1)
            join = rejected & ~leads & (best_lead_sim >= threshold)
            leader = leads
            lead_of = jnp.where(leader, row_idx, lead_of)

        # Cohesion check of each leader's would-be cluster (new clusters have
        # no history, so every criterion reduces to its screen)
        jkey = jnp.where(leader | join, lead_of, big)
        jorder, jgrp, _jstart = _group_ids_by_key(jkey)
        j_ok = (leader | join)[jorder]
        j_ls = jnp.where(j_ok[:, None], row_ls[jorder], 0)
        j_n = jnp.where(j_ok, row_n[jorder], 0)
        gj_ls = jax.ops.segment_sum(j_ls, jgrp, num_segments=m)
        gj_n = jax.ops.segment_sum(j_n, jgrp, num_segments=m)
        gj_ok = merge_accept_batch(
            criterion, threshold, gj_ls, jnp.maximum(gj_n, 2),
            jnp.zeros_like(gj_ls), jnp.ones_like(gj_n), gj_n,
            tolerance=tolerance,
        ) | (gj_n <= 1)
        join_ok = jnp.zeros((m,), bool).at[jorder].set(gj_ok[jgrp])
        join_commit = join & join_ok
        create_commit = leader

        # ---- 5. allocate slots for new clusters (ordered by row index) ----
        lead_rank = jnp.cumsum(create_commit.astype(jnp.int32)) - 1
        new_slot = state.num + lead_rank
        slot_of_row = jnp.where(
            merge_commit,
            best,
            jnp.where(
                create_commit,
                new_slot,
                jnp.where(join_commit, new_slot[lead_of], -1),
            ),
        )
        commit = merge_commit | create_commit | join_commit

        # ---- 6. scatter-commit clusters ----
        upd_slot = jnp.where(commit, slot_of_row, guard_c)
        add_ls = jnp.where(commit[:, None], row_ls, 0)
        add_n = jnp.where(commit, row_n, 0)
        ls = state.ls.at[upd_slot].add(add_ls)
        n = state.n.at[upd_slot].add(add_n)
        num = state.num + jnp.sum(create_commit.astype(jnp.int32))
        # New clusters live in the group their row was routed to
        cg = state.group.at[
            jnp.where(create_commit, new_slot, guard_c)
        ].set(jnp.where(create_commit, row_group, state.group[guard_c]))
        g_count = state.g_count.at[
            jnp.where(create_commit, row_group, state.g_ls.shape[0] - 1)
        ].add(jnp.where(create_commit, 1, 0))

        t_ls = ls[upd_slot]
        t_n = n[upd_slot]
        t_cent = majority_centroid_from_sums(t_ls, t_n).astype(jnp.bfloat16)
        cent = state.cent.at[upd_slot].set(t_cent)
        pops = state.pops.at[upd_slot].set(
            jnp.sum(t_cent.astype(jnp.int32), axis=-1)
        )

        # ---- 7. fold committed rows into their group CFs ----
        guard_g = state.g_ls.shape[0] - 1
        row_g_slot = jnp.where(commit, cg[upd_slot], guard_g)
        g_ls = state.g_ls.at[row_g_slot].add(add_ls)
        g_n = state.g_n.at[row_g_slot].add(add_n)
        tg_cent = majority_centroid_from_sums(
            g_ls[row_g_slot], jnp.maximum(g_n[row_g_slot], 1)
        ).astype(jnp.bfloat16)
        g_cent = state.g_cent.at[row_g_slot].set(tg_cent)
        g_pops = state.g_pops.at[row_g_slot].set(
            jnp.sum(tg_cent.astype(jnp.int32), axis=-1)
        )

        assigned = jnp.where(commit, slot_of_row, assigned)
        pending = pending & ~commit
        new_state = BatchState(
            ls, n, cent, pops, cg, num,
            g_ls, g_n, g_cent, g_pops, g_count, state.g_num,
        )
        return (new_state, pending, assigned, row_group, r + 1)

    pending0 = row_n > 0
    assigned0 = jnp.full((m,), -1, jnp.int32)
    rg0 = jnp.zeros((m,), jnp.int32)
    state, pending, assigned, last_rg, _ = lax.while_loop(
        cond, round_body, (state, pending0, assigned0, rg0, jnp.int32(0))
    )

    # Safety valve: rows still pending after max_rounds become singleton
    # clusters in their last routed group (deterministic)
    def flush(args):
        state, assigned = args
        rank = jnp.cumsum(pending.astype(jnp.int32)) - 1
        slot = jnp.where(pending, state.num + rank, guard_c)
        ls = state.ls.at[slot].add(jnp.where(pending[:, None], row_ls, 0))
        n = state.n.at[slot].add(jnp.where(pending, row_n, 0))
        t_cent = majority_centroid_from_sums(
            ls[slot], jnp.maximum(n[slot], 1)
        ).astype(jnp.bfloat16)
        cent = state.cent.at[slot].set(t_cent)
        pops = state.pops.at[slot].set(jnp.sum(t_cent.astype(jnp.int32), -1))
        grp = state.group.at[slot].set(
            jnp.where(pending, last_rg, state.group[guard_c])
        )
        guard_g = state.g_ls.shape[0] - 1
        g_slot = jnp.where(pending, last_rg, guard_g)
        g_ls = state.g_ls.at[g_slot].add(jnp.where(pending[:, None], row_ls, 0))
        g_n = state.g_n.at[g_slot].add(jnp.where(pending, row_n, 0))
        g_count = state.g_count.at[g_slot].add(jnp.where(pending, 1, 0))
        tg = majority_centroid_from_sums(
            g_ls[g_slot], jnp.maximum(g_n[g_slot], 1)
        ).astype(jnp.bfloat16)
        g_cent = state.g_cent.at[g_slot].set(tg)
        g_pops = state.g_pops.at[g_slot].set(jnp.sum(tg.astype(jnp.int32), -1))
        num = state.num + jnp.sum(pending.astype(jnp.int32))
        assigned = jnp.where(pending, slot, assigned)
        return (
            BatchState(
                ls, n, cent, pops, grp, num,
                g_ls, g_n, g_cent, g_pops, g_count, state.g_num,
            ),
            assigned,
        )

    state, assigned = lax.cond(
        jnp.any(pending), flush, lambda args: args, (state, assigned)
    )
    return state, assigned


class BatchTree:
    r"""Host driver for the batched device engine (data plane on device,
    topology control plane on host).

    ``fanout`` bounds the clusters per group; oversized groups are split on
    host between steps with the most-dissimilar-pair partition.
    """

    def __init__(
        self,
        n_features: int,
        *,
        threshold: float = 0.65,
        merge_criterion: str = "diameter",
        tolerance: float = 0.05,
        batch_size: int = 1024,
        fanout: int = 128,
        initial_capacity: int = 8192,
        centroid_block: int = 4096,
        max_rounds: int = 32,
    ) -> None:
        self.n_features = n_features
        self.threshold = threshold
        self.merge_criterion = merge_criterion
        self.tolerance = tolerance
        self.batch_size = batch_size
        self.fanout = fanout
        self.centroid_block = centroid_block
        self.max_rounds = max_rounds

        def pow2(x: int) -> int:
            p = 1
            while p < x:
                p *= 2
            return p

        # +1 keeps the last slot free as a scatter guard (never a live slot)
        self.capacity = pow2(
            max(initial_capacity, 2 * batch_size + 1, centroid_block)
        )
        self.g_capacity = pow2(max(256, self.capacity // max(fanout // 4, 1)))
        self.state = _init_state(self.capacity, self.g_capacity, n_features)
        self._num_groups = 1
        # Per-inserted-row slot assignments + mol bookkeeping (host side)
        self._row_slots: list[np.ndarray] = []
        self._row_mols: list[list[list[int]]] = []

    @property
    def num_clusters(self) -> int:
        return int(self.state.num)

    @property
    def num_groups(self) -> int:
        return int(self.state.g_num)

    def _ensure_capacity(self, incoming: int) -> None:
        # +1: the top slot of each table is a scatter guard and stays free
        need_c = self.num_clusters + incoming + 1
        need_g = self.num_groups + 2
        new_c, new_g = self.capacity, self.g_capacity
        while new_c < need_c:
            new_c *= 2
        while new_g < need_g:
            new_g *= 2
        if (new_c, new_g) != (self.capacity, self.g_capacity):
            self.state = jax.device_put(_grow_state(self.state, new_c, new_g))
            self.capacity, self.g_capacity = new_c, new_g

    # -- insertion -----------------------------------------------------------

    def insert_fps(
        self, unpacked_fps: np.ndarray, mol_indices: tp.Sequence[int]
    ) -> None:
        r"""Insert unpacked 0/1 fingerprints (one CF row of n=1 each)."""
        ls = unpacked_fps.astype(np.int32)
        ns = np.ones(len(ls), dtype=np.int32)
        self._insert_rows(ls, ns, [[int(i)] for i in mol_indices])

    def insert_buffers(
        self,
        buffers: np.ndarray,
        mol_index_seqs: tp.Sequence[tp.Sequence[int]],
    ) -> None:
        r"""Insert pre-aggregated CF buffers ``[linear_sum..., n]``."""
        ls = buffers[:, :-1].astype(np.int32)
        ns = buffers[:, -1].astype(np.int32)
        self._insert_rows(ls, ns, [list(s) for s in mol_index_seqs])

    def _insert_rows(
        self, ls: np.ndarray, ns: np.ndarray, mols: list[list[int]]
    ) -> None:
        m = self.batch_size
        for start in range(0, len(ls), m):
            chunk_ls = ls[start : start + m]
            chunk_n = ns[start : start + m]
            pad = m - len(chunk_ls)
            if pad:
                chunk_ls = np.pad(chunk_ls, ((0, pad), (0, 0)))
                chunk_n = np.pad(chunk_n, (0, pad))
            self._ensure_capacity(m)
            cent = np.where(
                (chunk_n > 1)[:, None],
                chunk_ls >= (chunk_n[:, None] * 0.5),
                np.clip(chunk_ls, 0, 1),
            )
            pops = cent.sum(axis=1, dtype=np.int32)
            self.state, assigned = _batch_step(
                self.state,
                jnp.asarray(chunk_ls, dtype=jnp.int32),
                jnp.asarray(chunk_n, dtype=jnp.int32),
                jnp.asarray(cent, dtype=jnp.bfloat16),
                jnp.asarray(pops, dtype=jnp.int32),
                jnp.float32(self.threshold),
                jnp.float32(self.tolerance),
                criterion=self.merge_criterion,
                block=self.centroid_block,
                max_rounds=self.max_rounds,
            )
            valid = min(m, len(ls) - start)
            self._row_slots.append(np.asarray(assigned)[:valid])
            self._row_mols.append(mols[start : start + valid])
            self._split_oversized_groups()

    # -- host control plane: group splits ------------------------------------

    def _split_oversized_groups(self) -> None:
        r"""Split any group whose cluster count exceeds ``fanout``.

        Mirrors the reference node split: seed with the most-dissimilar pair
        of member centroids, assign each member to the closer seed
        (``bblean/bitbirch.py:190-211``), second seed keeps the old group id.
        """
        g_count = np.asarray(self.state.g_count)[: self.num_groups]
        oversized = np.nonzero(g_count > self.fanout)[0]
        if not oversized.size:
            return
        cluster_group = np.array(self.state.group)[: self.num_clusters]
        ls_all = None
        for g in oversized:
            self._ensure_capacity(0)
            members = np.nonzero(cluster_group == g)[0]
            if ls_all is None:
                ls_all = np.asarray(self.state.ls)[: self.num_clusters]
                n_all = np.asarray(self.state.n)[: self.num_clusters]
            mls = ls_all[members]
            mn = n_all[members]
            cent = np.where(
                (mn > 1)[:, None], mls >= (mn[:, None] * 0.5), np.clip(mls, 0, 1)
            ).astype(np.uint8)
            packed = np.packbits(cent, axis=-1)
            total_ls = mls.sum(0, dtype=np.int64)
            seed_cent = centroid_from_sum(
                total_ls.astype(np.uint64), len(members), pack=True
            )
            cards = popcount(packed)
            sims_c = _jt_sim_packed_precalc_cardinalities(packed, seed_cent, cards)
            i1 = int(np.argmin(sims_c))
            sims1 = _jt_sim_packed_precalc_cardinalities(packed, packed[i1], cards)
            i2 = int(np.argmin(sims1))
            sims2 = _jt_sim_packed_precalc_cardinalities(packed, packed[i2], cards)
            to_new = sims1 > sims2
            to_new[i1] = True
            new_g = self.num_groups
            moved = members[to_new]
            kept = members[~to_new]
            cluster_group[moved] = new_g
            # Push updated topology + recomputed group CFs to device
            st = self.state
            moved_ls = mls[to_new].sum(0, dtype=np.int64)
            kept_ls = mls[~to_new].sum(0, dtype=np.int64)
            moved_n = int(mn[to_new].sum())
            kept_n = int(mn[~to_new].sum())

            def gcent(ls_sum, n_tot):
                c = centroid_from_sum(
                    ls_sum.astype(np.uint64), max(n_tot, 1), pack=False
                )
                return c.astype(np.float32)

            new_c = gcent(moved_ls, moved_n)
            old_c = gcent(kept_ls, kept_n)
            self.state = st._replace(
                group=st.group.at[jnp.asarray(moved)].set(new_g),
                g_ls=st.g_ls.at[new_g].set(moved_ls.astype(np.int32))
                .at[int(g)].set(kept_ls.astype(np.int32)),
                g_n=st.g_n.at[new_g].set(moved_n).at[int(g)].set(kept_n),
                g_cent=st.g_cent.at[new_g].set(new_c.astype(jnp.bfloat16))
                .at[int(g)].set(old_c.astype(jnp.bfloat16)),
                g_pops=st.g_pops.at[new_g].set(int(new_c.sum()))
                .at[int(g)].set(int(old_c.sum())),
                g_count=st.g_count.at[new_g].set(len(moved))
                .at[int(g)].set(len(kept)),
                g_num=st.g_num + 1,
            )
        # A split may leave a group still oversized: recurse until stable
        self._split_oversized_groups()

    # -- extraction ----------------------------------------------------------

    def cluster_sizes(self) -> np.ndarray:
        return np.asarray(self.state.n)[: self.num_clusters]

    def linear_sums(self) -> np.ndarray:
        return np.asarray(self.state.ls)[: self.num_clusters]

    def cluster_mols(self) -> list[list[int]]:
        r"""Molecule ids per cluster slot (slot order, not size order)."""
        out: list[list[int]] = [[] for _ in range(self.num_clusters)]
        for slots, mols in zip(self._row_slots, self._row_mols):
            for slot, mol_list in zip(slots, mols):
                out[int(slot)].extend(mol_list)
        return out

    def packed_centroids(self) -> np.ndarray:
        r"""Majority-vote centroids of all clusters, packed uint8."""
        ls = self.linear_sums()
        n = self.cluster_sizes()
        cent = np.where(
            (n > 1)[:, None], ls >= (n[:, None] * 0.5), np.clip(ls, 0, 1)
        ).astype(np.uint8)
        return np.packbits(cent, axis=-1)
