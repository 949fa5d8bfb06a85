r"""Vectorized (device) merge-acceptance predicates.

Batched counterparts of ``bblean_tpu._merges``: evaluate the accept decision
for C candidate merges at once.  Inputs per candidate: the merged linear sum
``new_ls`` / count ``new_n`` and the pre-merge host cluster ``old_ls`` /
``old_n`` plus nominee count ``nom_n``.  Returns a boolean mask.

The criterion is selected by a static string at trace time, so each compiled
engine step specializes to one branchless predicate.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import Array

from bblean_tpu.ops.isim import isim_from_sums, isim_radius_compl_from_sums

__all__ = ["merge_accept_batch", "DEVICE_MERGES"]

_N_MAX = 1000
_DECAY = 1e-3
# Python float: keeps the constant out of the traced graph (device-array
# constants force a host fetch at lowering time)
_OFFSET = math.exp(-_DECAY * _N_MAX)


def _adaptive_tol(tolerance: float, old_n: Array) -> Array:
    tol = tolerance * (jnp.exp(-_DECAY * old_n.astype(jnp.float32)) - _OFFSET)
    return jnp.maximum(tol, 0.0)


def merge_accept_batch(
    criterion: str,
    threshold: float | Array,
    new_ls: Array,
    new_n: Array,
    old_ls: Array,
    old_n: Array,
    nom_n: Array,
    tolerance: float = 0.05,
) -> Array:
    r"""Batched merge-accept mask for one of the six builtin criteria."""
    if criterion == "never-merge":
        return jnp.zeros(new_n.shape, dtype=bool)

    if criterion in ("radius", "tolerance-radius"):
        cohesion = isim_radius_compl_from_sums
    else:
        cohesion = isim_from_sums

    new_c = cohesion(new_ls, new_n)
    # new_n >= 2 always holds for merges, so new_c is finite
    screen = new_c >= threshold
    if criterion in ("radius", "diameter"):
        return screen

    old_c = jnp.where(old_n < 2, 0.0, cohesion(old_ls, jnp.maximum(old_n, 2)))
    if criterion in ("tolerance-diameter", "tolerance-radius"):
        tol = _adaptive_tol(tolerance, old_n)
        keep = (old_n == 1) | (new_c >= old_c - tol)
        return screen & keep
    if criterion == "tolerance-legacy":
        trivial = (old_n == 1) | (nom_n != 1)
        nf = new_n.astype(jnp.float32)
        of = old_n.astype(jnp.float32)
        growth = (new_c * nf - old_c * (of - 1)) * 0.5 >= old_c - tolerance
        return screen & (trivial | growth)
    raise ValueError(f"Unknown merge criterion {criterion}")


DEVICE_MERGES = [
    "radius",
    "diameter",
    "tolerance-diameter",
    "tolerance-radius",
    "tolerance-legacy",
    "never-merge",
]
