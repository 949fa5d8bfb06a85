r"""Device-mesh helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["get_mesh"]


def get_mesh(n_devices: int | None = None, axis_name: str = "dp") -> Mesh:
    r"""A 1-D mesh over the first ``n_devices`` devices (all by default).

    Clustering is data-parallel over fingerprint rows, so a single ``dp``
    axis rides ICI on a pod slice; multi-host layouts keep the same axis and
    let XLA place the all-gathers on ICI within a slice and DCN across.
    """
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"Requested {n_devices} devices, only {len(devices)} visible"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), axis_names=(axis_name,))
