r"""Pallas TPU kernel: sorted multi-row in-group packed-Tanimoto search.

The batched engine routes each pending row to a group, then scores the
row against that group's packed-centroid tile.  The XLA formulation gathers
one ``(Fc, F/8)`` tile PER ROW from HBM — ``M * Fc * F/8`` bytes per round
(4.3 GB at M=8192, Fc=512) even though a batch touches only a few hundred
distinct groups (merge-heavy batches route thousands of rows to ONE group).

This kernel exploits that: rows are pre-sorted by routed group (one small
XLA argsort), the grid walks 8-row sub-blocks of the sorted order, and each
distinct group's tile is DMA'd from HBM **once per batch** into a
double-buffered VMEM slot — the next segment's tile prefetches while the
current one is being scored.  HBM tile traffic drops from ``M`` tiles to
``D`` tiles (D = distinct routed groups, typically 60-5000 ≪ M).

The single-row variant (``ops/pallas_search.py``) lost to XLA because each
grid step DMA'd a full tile for one row; this is the sorted multi-row
layout it pointed to.  Semantics are identical to
``engine.batch._search_tiles``: best similarity is -2 where the routed tile
is empty or the row is not pending, ties resolve to the lowest tile
position, returned slot is clamped to >= 0.

Measured on v5e (M=8192, Fc=256, F8=256): **3.6-15x faster than the XLA
gather path as a standalone dispatch** (6.2 ms vs 22.5 ms at 511 spread
groups; 5.1 ms vs 26.4 ms on a real t=0.65 engine state; 5.2 ms vs 49 ms
on a t=0.3 state).  INSIDE the jitted batch step, however, XLA fuses the
gather+popcount+argmax into the round body and the fused form is ~2 ms —
there this kernel's extra argsort makes the full step ~5% slower, so the
engine keeps it opt-in (``BatchTree(use_pallas_search=True)``).  It is the
right primitive for standalone searches over big tile tables (e.g. probe
APIs), where XLA's unfused dynamic-gather lowering is 5-25x off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array, lax
from jax.experimental import pallas as pl

try:  # TPU-specific pallas backend; absent on some builds
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False

__all__ = [
    "tile_search_sorted",
    "sorted_search_plan",
    "tile_search_planned",
    "sorted_search_supported",
]

_NEG = -2.0
_SUB = 8  # rows per grid step (f32 sublane count)


def _kernel(
    # scalar prefetch
    sgrp_ref,  # (M,) i32 routed group per SORTED row (guard rows: G)
    nxt_ref,  # (M,) i32 group of the NEXT distinct segment at this row
    # blocked VMEM inputs
    rows_ref,  # (SUB, F8) u8 packed rows (sorted)
    pops_ref,  # (8, SUB) i32 row popcounts (8 grid steps per block)
    grp_ref,  # (8, SUB) i32 routed groups (vector copy for masks)
    # full-array HBM inputs
    t_pk_hbm,  # (G+1, Fc, F8) u8  (row G is a zero guard tile)
    t_pops_hbm,  # (G+1, 1, Fc) i32
    t_slot_hbm,  # (G+1, 1, Fc) i32
    # outputs
    sim_ref,  # (SUB, 128) f32
    slot_ref,  # (SUB, 128) i32
    # scratch
    tile_buf,  # (2, Fc, F8) u8
    pops_buf,  # (2, 1, Fc) i32
    slot_buf,  # (2, 1, Fc) i32
    state_ref,  # (4,) i32 SMEM: [cached_g, cur_slot, prefetch_g, pf_slot]
    sems,  # (2, 3) DMA semaphores
):
    i = pl.program_id(0)
    base = i * _SUB

    def dma(slot, g):
        return (
            pltpu.make_async_copy(t_pk_hbm.at[g], tile_buf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(t_pops_hbm.at[g], pops_buf.at[slot], sems.at[slot, 1]),
            pltpu.make_async_copy(t_slot_hbm.at[g], slot_buf.at[slot], sems.at[slot, 2]),
        )

    @pl.when(i == 0)
    def _():
        # Fetch the first segment's tile into slot 0 and start prefetching
        # the next distinct group into slot 1
        g0 = sgrp_ref[0]
        for d in dma(0, g0):
            d.start()
        for d in dma(0, g0):
            d.wait()
        n0 = nxt_ref[0]
        for d in dma(1, n0):
            d.start()
        state_ref[0] = g0
        state_ref[1] = 0
        state_ref[2] = n0
        state_ref[3] = 1

    r8 = i % 8  # row within the (8, SUB) metadata block
    grp_vec = grp_ref[r8, :]  # (SUB,)
    row_pop = pops_ref[r8, :]

    def score(slot_idx, g):
        tile = tile_buf[slot_idx].astype(jnp.int32)  # (Fc, F8)
        rows = rows_ref[...].astype(jnp.int32)  # (SUB, F8)
        inter = jnp.sum(
            lax.population_count(
                jnp.bitwise_and(rows[:, None, :], tile[None, :, :])
            ),
            axis=-1,
        )  # (SUB, Fc)
        union = pops_buf[slot_idx, 0, :][None, :] + row_pop[:, None] - inter
        sims = inter.astype(jnp.float32) / jnp.maximum(union, 1).astype(
            jnp.float32
        )
        slots = slot_buf[slot_idx, 0, :][None, :]  # (1, Fc)
        # Mask rows of other segments.  NB: broadcast the int32 group
        # vector BEFORE comparing — Mosaic cannot insert a minor dim on
        # sub-32-bit (bool) vectors
        mask_g = grp_vec[:, None] == g  # (SUB, 1)
        sims = jnp.where((slots >= 0) & mask_g, sims, _NEG)
        fc = sims.shape[1]
        best = jnp.max(sims, axis=1)  # (SUB,)
        cols = lax.broadcasted_iota(jnp.int32, (_SUB, fc), 1)
        big = jnp.int32(1 << 30)
        bidx = jnp.min(
            jnp.where(sims == best[:, None], cols, big), axis=1
        )
        bslot = jnp.sum(
            jnp.where(cols == bidx[:, None], jnp.broadcast_to(slots, sims.shape), 0),
            axis=1,
        )
        return best, bslot

    # Walk the distinct segments inside this sub-block (sorted rows: each
    # segment is one run).  Typically one iteration; up to SUB at high
    # thresholds where most groups receive a single row.
    def cond(carry):
        t, _best, _bslot = carry
        return t < _SUB

    def body(carry):
        t, best, bslot = carry
        g = sgrp_ref[base + t]

        # Ensure the current buffer holds g's tile; the prefetched buffer
        # always holds the NEXT distinct segment's tile
        @pl.when(g != state_ref[0])
        def _():
            pf_slot = state_ref[3]
            for d in dma(pf_slot, state_ref[2]):
                d.wait()
            state_ref[0] = state_ref[2]
            state_ref[1] = pf_slot
            nxt = nxt_ref[base + t]
            for d in dma(1 - pf_slot, nxt):
                d.start()
            state_ref[2] = nxt
            state_ref[3] = 1 - pf_slot

        b2, s2 = score(state_ref[1], g)
        take = b2 > best
        best = jnp.where(take, b2, best)
        bslot = jnp.where(take, s2, bslot)

        # Advance past this run
        def adv_cond(tn):
            return (tn < _SUB) & (sgrp_ref[base + jnp.minimum(tn, _SUB - 1)] == g)

        t = lax.while_loop(adv_cond, lambda tn: tn + 1, t + 1)
        return t, best, bslot

    init = (
        jnp.int32(0),
        jnp.full((_SUB,), _NEG, jnp.float32),
        jnp.zeros((_SUB,), jnp.int32),
    )
    _, best, bslot = lax.while_loop(cond, body, init)

    # Exactly one prefetch DMA is always in flight; drain it at the end of
    # the grid (Mosaic aborts on un-consumed DMA semaphores)
    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        for d in dma(state_ref[3], state_ref[2]):
            d.wait()

    sim_ref[...] = jnp.broadcast_to(best[:, None], (_SUB, 128))
    slot_ref[...] = jnp.broadcast_to(
        jnp.maximum(bslot, 0)[:, None], (_SUB, 128)
    )


@functools.partial(jax.jit, static_argnames=("interpret", "guard_group"))
def tile_search_sorted(
    row_pk: Array,  # (M, F8) uint8
    row_pop: Array,  # (M,) int32
    row_group: Array,  # (M,) int32
    t_pk: Array,  # (G, Fc, F8) uint8
    t_pops: Array,  # (G, Fc) int32
    t_slot: Array,  # (G, Fc) int32
    pending: Array,  # (M,) bool
    interpret: bool = False,
    guard_group: int | None = None,
) -> tuple[Array, Array]:
    r"""Sorted multi-row fused search; same contract as ``_search_tiles``.

    ``guard_group``: index of a tile whose slots are all -1 (non-pending
    rows and the tail prefetch aim there).  When None a zero guard row is
    appended — that copies the whole tile table, so callers with large
    tables should reserve a guard tile instead (the batch engine's state
    keeps its last group slot permanently empty for exactly this).
    """
    m, f8 = row_pk.shape
    g, fc, _ = t_pk.shape
    if not interpret and (fc % 128 or f8 % 128 or m % 64):
        # DMA slices must be lane-aligned; metadata blocks span 8 grid steps
        raise ValueError(
            "tile_search_sorted (compiled) needs Fc % 128 == 0, "
            f"F8 % 128 == 0 and M % 64 == 0; got Fc={fc} F8={f8} M={m}"
        )

    # Sort rows by routed group; non-pending rows sink to the guard tile
    guard = g if guard_group is None else guard_group
    key = jnp.where(pending, row_group, guard)
    order, skey, nxt = sorted_search_plan(key, guard)
    srows = row_pk[order]
    spops = row_pop[order]
    return _run_planned(
        srows, spops, skey, nxt, order, t_pk, t_pops, t_slot, pending,
        guard_group, interpret,
    )


def sorted_search_plan(key: Array, guard: int) -> tuple[Array, Array, Array]:
    r"""Sort schedule for the kernel: rows ordered by routed group plus the
    prefetcher's next-distinct-group table.

    ``key`` is the per-row routed group (rows to skip should carry
    ``guard``).  The batch engine's routed groups are STEP-constant (see
    ``engine.batch._batch_step_impl``), so the plan — argsort included —
    is computed once per step and reused by every insert round via
    ``tile_search_planned``; the per-call argsort was what kept this
    kernel off the in-step hot path.
    """
    m = key.shape[0]
    order = jnp.argsort(key, stable=True)
    skey = key[order]
    # Next-distinct-group schedule for the prefetcher: for each sorted row,
    # the key of the segment after its own (guard when none).
    seg = jnp.cumsum(
        jnp.concatenate([jnp.zeros((1,), jnp.int32),
                         (skey[1:] != skey[:-1]).astype(jnp.int32)])
    )
    # first key per segment id (segments are contiguous)
    seg_first_key = jax.ops.segment_min(skey, seg, num_segments=m)
    # Rows of the last segment prefetch the guard tile (seg_first_key of an
    # empty segment is int32 max -> clamp to the guard index)
    nxt = jnp.clip(seg_first_key[jnp.minimum(seg + 1, m - 1)], 0, guard)
    return order, skey, nxt


def tile_search_planned(
    srows: Array,  # (M, F8) uint8, pre-sorted by plan order
    spops: Array,  # (M,) int32, pre-sorted
    skey: Array,  # (M,) int32 sorted group keys (from sorted_search_plan)
    nxt: Array,  # (M,) int32 prefetch schedule
    order: Array,  # (M,) int32 the plan's sort order (for the unsort)
    t_pk: Array,
    t_pops: Array,
    t_slot: Array,
    pending: Array,  # (M,) bool CURRENT pending mask (row order)
    guard_group: int,
    interpret: bool = False,
) -> tuple[Array, Array]:
    r"""Kernel call on a precomputed plan; same contract as
    ``tile_search_sorted`` except rows keyed to a group they no longer
    need (e.g. assigned in an earlier round) are scored then masked by
    ``pending`` — the tile DMA count stays at D distinct groups either
    way, and the scoring is the same work the XLA gather path spends on
    masked rows too."""
    return _run_planned(
        srows, spops, skey, nxt, order, t_pk, t_pops, t_slot, pending,
        guard_group, interpret,
    )


def _run_planned(
    srows, spops, skey, nxt, order, t_pk, t_pops, t_slot, pending,
    guard_group, interpret,
):
    m, f8 = srows.shape
    g, fc, _ = t_pk.shape
    if guard_group is None:
        # Guard tile: zeros with slot -1 (never matches, sim stays -2).
        # Appending copies the table — fine for small standalone use only.
        t_pk_g = jnp.concatenate([t_pk, jnp.zeros((1, fc, f8), t_pk.dtype)], 0)
        t_pops_g = jnp.concatenate(
            [t_pops, jnp.zeros((1, fc), t_pops.dtype)], 0
        )[:, None, :]
        t_slot_g = jnp.concatenate(
            [t_slot, jnp.full((1, fc), -1, t_slot.dtype)], 0
        )[:, None, :]
    else:
        t_pk_g = t_pk
        t_pops_g = t_pops[:, None, :]
        t_slot_g = t_slot[:, None, :]

    n_blocks = m // _SUB
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((_SUB, f8), lambda i, s, n: (i, 0)),
            pl.BlockSpec((8, _SUB), lambda i, s, n: (i // 8, 0)),
            pl.BlockSpec((8, _SUB), lambda i, s, n: (i // 8, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((_SUB, 128), lambda i, s, n: (i, 0)),
            pl.BlockSpec((_SUB, 128), lambda i, s, n: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, fc, f8), jnp.uint8),
            pltpu.VMEM((2, 1, fc), jnp.int32),
            pltpu.VMEM((2, 1, fc), jnp.int32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    s_sim, s_slot = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m, 128), jnp.float32),
            jax.ShapeDtypeStruct((m, 128), jnp.int32),
        ],
        interpret=interpret,
    )(
        skey,
        nxt,
        srows,
        spops.reshape(n_blocks, _SUB),
        skey.reshape(n_blocks, _SUB),
        t_pk_g,
        t_pops_g,
        t_slot_g,
    )
    # Undo the sort
    best_sim = jnp.zeros((m,), jnp.float32).at[order].set(s_sim[:, 0])
    best_slot = jnp.zeros((m,), jnp.int32).at[order].set(s_slot[:, 0])
    best_sim = jnp.where(pending, best_sim, _NEG)
    return best_sim, jnp.maximum(best_slot, 0)


@functools.lru_cache(maxsize=1)
def sorted_search_supported() -> bool:
    r"""Probe whether the sorted Pallas search compiles + runs CORRECTLY here.

    Runs a small non-trivial case (random rows, 3 part-filled tiles, mixed
    pending mask) and compares sims and slots against the XLA reference
    search — a backend where the kernel compiles but miscomputes must fall
    back rather than silently corrupt search results.
    """
    if not _HAS_PLTPU:
        return False
    import numpy as np

    from bblean_tpu.engine.batch import _search_tiles

    rng = np.random.default_rng(7)
    m, f8, g, fc = 64, 128, 4, 128
    row_pk = jnp.asarray(rng.integers(0, 256, (m, f8), dtype=np.uint8))
    row_pop = jnp.asarray(
        np.unpackbits(np.asarray(row_pk), axis=-1).sum(-1).astype(np.int32)
    )
    row_group = jnp.asarray(rng.integers(0, g - 1, (m,), dtype=np.int32))
    t_pk = np.zeros((g, fc, f8), np.uint8)
    t_slot = np.full((g, fc), -1, np.int32)
    fill = 9  # part-filled tiles; the last group is the empty guard
    t_pk[: g - 1, :fill] = rng.integers(0, 256, (g - 1, fill, f8), np.uint8)
    t_slot[: g - 1, :fill] = np.arange((g - 1) * fill).reshape(g - 1, fill)
    t_pops = np.unpackbits(t_pk, axis=-1).sum(-1).astype(np.int32)
    pending = jnp.asarray(rng.random(m) < 0.8)
    args = (
        row_pk, row_pop, row_group, jnp.asarray(t_pk),
        jnp.asarray(t_pops), jnp.asarray(t_slot), pending,
    )
    try:
        sim, slot = tile_search_sorted(*args, guard_group=g - 1)
        jax.block_until_ready((sim, slot))
    except Exception:
        return False
    ref_sim, ref_slot = _search_tiles(*args)
    ref_sim = np.asarray(ref_sim)
    # Slots are only defined where a candidate exists (sim > -2 sentinel);
    # the kernel and the gather use different no-candidate sentinels.
    has_cand = ref_sim > -1.5
    return bool(
        np.allclose(np.asarray(sim), ref_sim, atol=1e-6)
        and np.array_equal(np.asarray(slot)[has_cand], np.asarray(ref_slot)[has_cand])
    )
