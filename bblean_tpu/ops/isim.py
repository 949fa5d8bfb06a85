r"""Device-side batched iSIM and radius cohesion.

The host kernels (``bblean_tpu._np_similarity``) evaluate one linear sum at a
time in float64.  The TPU path evaluates *batches* of candidate cluster
features at once — one row per candidate — in float32 (documented precision
contract of the batch engine; the exact engines keep float64 on host).

Quantities per candidate row (linear sum ``ls``, count ``n``):

- ``K = sum(ls)``, ``Ksq = sum(ls^2)`` (exact in f32 for the fingerprint
  widths/counts the batch engine handles; computed in f32 from int32 sums)
- ``isim = a / (a + n*K - Ksq)`` with ``a = (Ksq - K)/2``; all-zero sums give
  1.0, ``n < 2`` gives NaN to mirror host semantics.
- radius complement via the majority-vote centroid fold-in, identical formula
  to ``bblean_tpu.similarity.jt_isim_radius_compl_from_sum``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

__all__ = [
    "isim_from_sums",
    "isim_radius_compl_from_sums",
    "majority_centroid_from_sums",
]


def isim_from_sums(ls: Array, n: Array) -> Array:
    r"""Batched iSIM: ``ls`` (C, F) linear sums, ``n`` (C,) counts -> (C,) f32.

    Precision contract: K and Ksq are f32 tree reductions over int32 sums,
    giving relative error ~= log2(F) * 2^-24.  Measured against the host
    float64 kernel, the worst case over cluster sizes up to 10M members and
    densities 0.1-0.9 is < 3e-7 relative (``tests/test_ops.py``,
    ``test_isim_precision_at_scale``) — merge decisions can only flip
    within that margin of the threshold.
    """
    lsf = ls.astype(jnp.float32)
    k = jnp.sum(lsf, axis=-1)
    ksq = jnp.sum(lsf * lsf, axis=-1)
    nf = n.astype(jnp.float32)
    a = (ksq - k) * 0.5
    denom = a + nf * k - ksq
    isim = a / denom
    isim = jnp.where(k == 0, 1.0, isim)
    return jnp.where(n < 2, jnp.nan, isim)


def majority_centroid_from_sums(ls: Array, n: Array) -> Array:
    r"""Batched majority-vote centroid: (C, F) sums, (C,) counts -> (C, F) u8.

    For ``n <= 1`` the centroid is the (0/1) linear sum itself.
    """
    nf = n.astype(jnp.float32)[:, None]
    vote = (ls.astype(jnp.float32) >= nf * 0.5).astype(jnp.uint8)
    single = jnp.clip(ls, 0, 1).astype(jnp.uint8)
    return jnp.where(n[:, None] <= 1, single, vote)


def isim_radius_compl_from_sums(ls: Array, n: Array) -> Array:
    r"""Batched complement-of-radius cohesion from linear sums and counts."""
    cent = majority_centroid_from_sums(ls, n)
    ls1 = ls + cent.astype(ls.dtype)
    nf = n.astype(jnp.float32)
    isim_n = isim_from_sums(ls, n)
    # n == 1 has undefined isim; the (n - 1) weight zeroes it out, so
    # substitute a finite value to avoid NaN propagation
    isim_n = jnp.where(n < 2, 0.0, isim_n)
    isim_n1 = isim_from_sums(ls1, n + 1)
    return (isim_n1 * (nf + 1) - isim_n * (nf - 1)) * 0.5
