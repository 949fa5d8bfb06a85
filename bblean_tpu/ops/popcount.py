r"""Device-side popcount over packed fingerprint rows.

Packed uint8 bytes are widened to int32 lanes and counted with
``lax.population_count`` on the VPU.  (Reinterpreting 4 bytes per int32 word
would quarter the lane count, but TPU uint8->int32 widening is free enough
that the simple form wins for the row lengths used here, and it keeps the
kernel shape-agnostic.)
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array, lax

__all__ = ["popcount_device", "popcount_rows"]


def popcount_device(packed: Array) -> Array:
    r"""Per-row popcount of a packed (..., B) uint8 array -> (...,) int32."""
    words = packed.astype(jnp.int32)
    return jnp.sum(lax.population_count(words), axis=-1)


def popcount_rows(unpacked: Array) -> Array:
    r"""Per-row popcount of an unpacked (..., F) 0/1 array -> (...,) int32."""
    return jnp.sum(unpacked.astype(jnp.int32), axis=-1)
