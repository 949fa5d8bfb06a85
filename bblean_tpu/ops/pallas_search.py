r"""Pallas TPU kernel: fused in-group packed-Tanimoto search.

The batched engine's hottest non-matmul op is the in-group candidate search:
for every row, gather its routed group's packed-centroid tile ``(Fc, F/8)``
from HBM and compute AND + popcount Tanimoto + masked argmax.  The XLA
expression materializes the gathered ``(M, Fc, F/8)`` tensor and runs each
step as separate kernels; this Pallas version streams one tile per grid step
(scalar-prefetched group id -> block index map, so the gather IS the DMA
schedule) and fuses popcount, similarity, masking and argmax in VMEM.

Falls back transparently to the jnp path (``engine.batch._search_tiles``)
when Pallas is unavailable on the current backend.

Status: bit-identical to the jnp path, but measured ~3x slower on v5e at the
production shapes (M=4096, Fc=256, F8=256) — one-tile-per-grid-step DMA
leaves the VPU idle between small steps, while XLA's fused gather pipeline
wins.  Kept as an op (and a template for multi-row tiles) but not wired into
the engine by default; see ``BatchTree(use_pallas_search=...)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array, lax
from jax.experimental import pallas as pl

try:  # TPU-specific memory spaces; absent on some backends
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    _HAS_PLTPU = False

__all__ = ["tile_search_pallas", "pallas_search_supported"]

_NEG = -2.0


def _search_kernel(
    group_ref,  # scalar-prefetch: (M,) int32 routed group per row
    pop_ref,  # scalar-prefetch: (M,) int32 row popcounts
    row_pk_ref,  # (1, 1, F8) uint8 block: this row's packed centroid
    tile_pk_ref,  # (1, Fc, F8) uint8 block: the routed group's tile
    tile_pops_ref,  # (1, 1, Fc) int32
    tile_slot_ref,  # (1, 1, Fc) int32
    best_sim_ref,  # (1, 1, 128) float32 out
    best_slot_ref,  # (1, 1, 128) int32 out
):
    i = pl.program_id(0)
    pk = row_pk_ref[0, 0, :].astype(jnp.int32)  # (F8,)
    tile = tile_pk_ref[0].astype(jnp.int32)  # (Fc, F8)
    inter = jnp.sum(
        lax.population_count(jnp.bitwise_and(tile, pk[None, :])), axis=-1
    )  # (Fc,)
    union = tile_pops_ref[0, 0, :] + pop_ref[i] - inter
    sims = inter.astype(jnp.float32) / jnp.maximum(union, 1).astype(
        jnp.float32
    )
    slots = tile_slot_ref[0, 0, :]
    sims = jnp.where(slots >= 0, sims, _NEG)
    # First-occurrence argmax without dynamic indexing (not lowerable on TPU
    # Pallas): select via masks and reductions
    sims2 = sims[None, :]
    best_val = jnp.max(sims2)
    cols = lax.broadcasted_iota(jnp.int32, (1, sims.shape[0]), 1)
    big = jnp.int32(1 << 30)
    best_idx = jnp.min(jnp.where(sims2 == best_val, cols, big))
    sel = cols == best_idx
    best_slot = jnp.sum(jnp.where(sel, slots[None, :], 0))
    # Vector stores only in VMEM: broadcast the scalars across the lane dim
    best_sim_ref[0, 0, :] = jnp.full((128,), best_val, jnp.float32)
    best_slot_ref[0, 0, :] = jnp.full((128,), jnp.maximum(best_slot, 0), jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def tile_search_pallas(
    row_pk: Array,  # (M, F8) uint8
    row_pop: Array,  # (M,) int32
    row_group: Array,  # (M,) int32
    t_pk: Array,  # (G_cap, Fc, F8) uint8
    t_pops: Array,  # (G_cap, Fc) int32
    t_slot: Array,  # (G_cap, Fc) int32
    pending: Array,  # (M,) bool
    interpret: bool = False,
) -> tuple[Array, Array]:
    r"""Fused per-row in-group search; same contract as
    ``engine.batch._search_tiles``."""
    m, f8 = row_pk.shape
    _g, fc, _f8 = t_pk.shape

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(m,),
        in_specs=[
            pl.BlockSpec((1, 1, f8), lambda i, grp, pop: (i, 0, 0)),
            pl.BlockSpec((1, fc, f8), lambda i, grp, pop: (grp[i], 0, 0)),
            pl.BlockSpec((1, 1, fc), lambda i, grp, pop: (grp[i], 0, 0)),
            pl.BlockSpec((1, 1, fc), lambda i, grp, pop: (grp[i], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 128), lambda i, grp, pop: (i, 0, 0)),
            pl.BlockSpec((1, 1, 128), lambda i, grp, pop: (i, 0, 0)),
        ],
    )
    best_sim, best_slot = pl.pallas_call(
        _search_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m, 1, 128), jnp.float32),
            jax.ShapeDtypeStruct((m, 1, 128), jnp.int32),
        ],
        interpret=interpret,
    )(
        row_group,
        row_pop,
        row_pk[:, None, :],
        t_pk,
        t_pops[:, None, :],
        t_slot[:, None, :],
    )
    best_sim = jnp.where(pending, best_sim[:, 0, 0], _NEG)
    return best_sim, best_slot[:, 0, 0]


@functools.lru_cache(maxsize=1)
def pallas_search_supported() -> bool:
    r"""Probe whether the fused Pallas search compiles + runs here."""
    if not _HAS_PLTPU:
        return False
    import numpy as np

    try:
        out = tile_search_pallas(
            jnp.zeros((8, 8), jnp.uint8),
            jnp.zeros((8,), jnp.int32),
            jnp.zeros((8,), jnp.int32),
            jnp.zeros((2, 8, 8), jnp.uint8),
            jnp.zeros((2, 8), jnp.int32),
            jnp.full((2, 8), -1, jnp.int32),
            jnp.ones((8,), bool),
        )
        jax.block_until_ready(out)
        return bool(np.all(np.asarray(out[0]) == _NEG))
    except Exception:
        return False
