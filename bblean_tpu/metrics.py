r"""Clustering quality metrics under the Tanimoto metric.

Parity notes: same definitions as the reference (``bblean/metrics.py``):
iSIM-based Calinski-Harabasz (``:47-105``), Davies-Bouldin over Tanimoto
distances (``:108-159``) and the iSIM Dunn variant (``:163-199``), with
centroid/medoid central selection (``:23-44``).
"""

from __future__ import annotations

import typing as tp

import numpy as np
from numpy.typing import NDArray

from bblean_tpu._np_similarity import (
    centroid as centroid_from_fps,
    centroid_from_sum,
    jt_isim_from_sum,
    jt_isim_medoid,
    jt_isim_packed,
    jt_isim_unpacked,
)
from bblean_tpu.fingerprints import pack_fingerprints, unpack_fingerprints
from bblean_tpu.similarity import jt_sim_packed

__all__ = ["jt_isim_chi", "jt_isim_dunn", "jt_dbi"]


def _calc_centrals(
    cluster_fps: list[NDArray[np.uint8]],
    kind: str,
    input_is_packed: bool = True,
    n_features: int | None = None,
    pack: bool = True,
) -> list[NDArray[np.uint8]]:
    if kind == "medoid":
        return [
            jt_isim_medoid(
                c, input_is_packed=input_is_packed, n_features=n_features,
                pack=pack,
            )[1]
            for c in cluster_fps
        ]
    if kind == "centroid":
        return [
            centroid_from_fps(
                c, input_is_packed=input_is_packed, n_features=n_features,
                pack=pack,
            )
            for c in cluster_fps
        ]
    raise ValueError(f"Unknown arg {kind} use 'medoid|centroid'")


def jt_isim_chi(
    cluster_fps: list[NDArray[np.uint8]],
    all_fps_central: NDArray[np.uint8] | str = "centroid",
    centrals: list[NDArray[np.uint8]] | str = "centroid",
    input_is_packed: bool = True,
    n_features: int | None = None,
    verbose: bool = False,
) -> float:
    r"""Calinski-Harabasz index via Tanimoto distances (higher is better)."""
    all_fps_num = sum(len(c) for c in cluster_fps)
    if isinstance(all_fps_central, str):
        if all_fps_central != "centroid":
            raise NotImplementedError("Currently only 'centroid' implemented for CHI")
        if input_is_packed:
            unpacked = [unpack_fingerprints(c, n_features) for c in cluster_fps]
        else:
            unpacked = cluster_fps
        total_ls = sum(np.sum(c, axis=0, dtype=np.uint64) for c in unpacked)
        all_fps_central = centroid_from_sum(total_ls, all_fps_num)

    if isinstance(centrals, str):
        if centrals != "centroid":
            raise NotImplementedError("Currently only 'centroid' implemented for CHI")
        centrals = _calc_centrals(cluster_fps, centrals, input_is_packed, n_features)
    elif not input_is_packed:
        centrals = [pack_fingerprints(c) for c in centrals]

    if not input_is_packed:
        cluster_fps = [pack_fingerprints(c) for c in cluster_fps]
    n_clusters = len(cluster_fps)
    if n_clusters <= 1:
        return 0

    wcss = 0.0
    bcss = 0.0
    for central, clust in zip(centrals, cluster_fps):
        bcss += len(clust) * (1 - float(jt_sim_packed(all_fps_central, central))) ** 2
        d = 1 - jt_sim_packed(clust, central)
        wcss += float(np.dot(d, d))
    return bcss * (all_fps_num - n_clusters) / (wcss * (n_clusters - 1))


def jt_dbi(
    cluster_fps: list[NDArray[np.uint8]],
    centrals: list[NDArray[np.uint8]] | str = "centroid",
    input_is_packed: bool = True,
    n_features: int | None = None,
    verbose: bool = False,
) -> float:
    r"""Davies-Bouldin index via Tanimoto distances (lower is better)."""
    if isinstance(centrals, str):
        centrals = _calc_centrals(cluster_fps, centrals, input_is_packed, n_features)
    elif not input_is_packed:
        centrals = [pack_fingerprints(c) for c in centrals]
    if not input_is_packed:
        cluster_fps = [pack_fingerprints(c) for c in cluster_fps]

    fps_num = 0
    scatter: list[float] = []
    for central, clust in zip(centrals, cluster_fps):
        scatter.append(float(np.sum(1 - jt_sim_packed(clust, central))) / len(clust))
        fps_num += len(clust)
    if fps_num == 0:
        return 0

    numerator = 0.0
    for i, central in enumerate(centrals):
        worst = 0.0
        for j, other in enumerate(centrals):
            if i == j:
                continue
            separation = 1 - float(jt_sim_packed(central, other))
            worst = max(worst, (scatter[i] + scatter[j]) / separation)
        numerator += worst
    return numerator / fps_num


def jt_isim_dunn(
    cluster_fps: list[NDArray[np.uint8]],
    input_is_packed: bool = True,
    n_features: int | None = None,
    verbose: bool = False,
) -> float:
    r"""Dunn index approximated with iSIM diameters (higher is better)."""
    if input_is_packed:
        diam = [jt_isim_packed(c) for c in cluster_fps]
        cluster_fps = [unpack_fingerprints(c, n_features) for c in cluster_fps]
    else:
        diam = [jt_isim_unpacked(c) for c in cluster_fps]
    max_d = max(diam)
    if max_d == 0:
        return 1
    min_sep = 1.0
    sums = [np.sum(c, axis=0, dtype=np.uint64) for c in cluster_fps]
    for i in range(len(cluster_fps) - 1):
        for j in range(i + 1, len(cluster_fps)):
            combined = sums[i] + sums[j]
            d_ij = 1 - jt_isim_from_sum(
                combined, len(cluster_fps[i]) + len(cluster_fps[j])
            )
            min_sep = min(min_sep, d_ij)
    return min_sep / max(diam)
