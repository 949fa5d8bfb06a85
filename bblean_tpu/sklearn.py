r"""scikit-learn estimator adapters for BitBirch.

Drop-in replacements for ``sklearn.cluster.Birch`` respecting the full
estimator contract (fit / partial_fit / fit_predict / predict / transform /
get_params / set_params / set_output / feature names), with Jaccard
("jaccard" metric over boolean views) distances against the subcluster
centroids.  Parity with the reference adapter (``bblean/sklearn.py:51-203``).
"""

from __future__ import annotations

import typing as tp

import numpy as np
from numpy.typing import NDArray

from sklearn.base import (
    BaseEstimator,
    ClassNamePrefixFeaturesOutMixin,
    ClusterMixin,
    TransformerMixin,
    _fit_context,
)
from sklearn.metrics import pairwise_distances, pairwise_distances_argmin
from sklearn.utils.validation import check_is_fitted, validate_data

from bblean_tpu._merges import MergeAcceptFunction
from bblean_tpu.fingerprints import unpack_fingerprints
from bblean_tpu.tree import BitBirch as _BitBirch

__all__ = ["BitBirch", "UnpackedBitBirch"]


class BitBirch(
    ClassNamePrefixFeaturesOutMixin,
    ClusterMixin,
    TransformerMixin,
    BaseEstimator,
    _BitBirch,
):
    r"""sklearn-contract BitBIRCH estimator over *packed* fingerprints.

    Use ``UnpackedBitBirch`` when inputs are unpacked 0/1 arrays.
    """

    _parameter_constraints: dict[str, list[tp.Any]] = {}

    def __init__(
        self,
        *,
        threshold: float = 0.65,
        branching_factor: int = 50,
        merge_criterion: str | MergeAcceptFunction | None = None,
        tolerance: float | None = None,
        compute_labels: bool = True,
    ):
        super().__init__(
            threshold=threshold,
            branching_factor=branching_factor,
            merge_criterion=merge_criterion,
            tolerance=tolerance,
        )
        self.compute_labels = compute_labels

    def _refresh_fitted_state(self) -> None:
        engine = self._require_engine()
        centroids = np.stack(
            [
                unpack_fingerprints(
                    engine.sub_packed_centroid(s), engine.n_features
                )
                for s in engine.leaf_sub_ids(sort=True)
            ]
        )
        self.subcluster_centers_ = centroids
        self.subcluster_labels_ = np.arange(1, len(centroids) + 1)
        self._n_features_out = centroids.shape[0]

    @_fit_context(prefer_skip_nested_validation=True)
    def fit(  # type: ignore[override]
        self, X, y=None, input_is_packed: bool = True, n_features: int | None = None
    ) -> "BitBirch":
        _BitBirch.fit(self, X, input_is_packed=input_is_packed, n_features=n_features)
        self._refresh_fitted_state()
        if self.compute_labels:
            self.labels_ = self.get_assignments()
        return self

    @_fit_context(prefer_skip_nested_validation=True)
    def partial_fit(  # type: ignore[override]
        self,
        X=None,
        y=None,
        input_is_packed: bool = True,
        n_features: int | None = None,
    ) -> "BitBirch":
        if X is None:
            raise ValueError()
        self.fit(X, input_is_packed=input_is_packed, n_features=n_features)
        if self.compute_labels:
            self.labels_ = self.get_assignments()
        return self

    def fit_predict(  # type: ignore[override]
        self, X, y=None, input_is_packed: bool = True, n_features: int | None = None
    ) -> NDArray[np.integer]:
        self.fit(X, input_is_packed=input_is_packed, n_features=n_features)
        if not self.compute_labels:
            self.labels_ = self.get_assignments()
        return self.labels_

    def _as_bool_bits(
        self, X, input_is_packed: bool, n_features: int | None
    ) -> NDArray[np.bool_]:
        X = validate_data(self, X, accept_sparse="csr", reset=False)
        bits = unpack_fingerprints(X, n_features=n_features) if input_is_packed else X
        return bits.astype(np.uint8, copy=False).view(np.bool_)

    def predict(  # type: ignore[override]
        self, X, input_is_packed: bool = True, n_features: int | None = None
    ) -> NDArray[np.integer]:
        r"""Assign rows to the nearest (Jaccard) subcluster centroid."""
        check_is_fitted(self)
        bits = self._as_bool_bits(X, input_is_packed, n_features)
        centers = self.subcluster_centers_.astype(np.uint8, copy=False).view(
            np.bool_
        )
        nearest = pairwise_distances_argmin(bits, centers, metric="jaccard")
        return self.subcluster_labels_[nearest]

    def transform(  # type: ignore[override]
        self, X, input_is_packed: bool = True, n_features: int | None = None
    ):
        r"""Jaccard distance of every row to every subcluster centroid."""
        check_is_fitted(self)
        bits = self._as_bool_bits(X, input_is_packed, n_features)
        centers = self.subcluster_centers_.astype(np.uint8, copy=False).view(
            np.bool_
        )
        return pairwise_distances(bits, centers, metric="jaccard")

    def __sklearn_tags__(self):  # type: ignore[override]
        tags = super().__sklearn_tags__()
        tags.input_tags.sparse = True
        return tags


class UnpackedBitBirch(BitBirch):
    r"""sklearn-contract BitBIRCH estimator over *unpacked* fingerprints."""

    def fit(  # type: ignore[override]
        self, X, y=None, input_is_packed: bool = False, n_features: int | None = None
    ) -> "UnpackedBitBirch":
        return super().fit(X, y, input_is_packed=input_is_packed, n_features=n_features)

    def partial_fit(  # type: ignore[override]
        self, X, y=None, input_is_packed: bool = False, n_features: int | None = None
    ):
        return super().partial_fit(
            X, y, input_is_packed=input_is_packed, n_features=n_features
        )

    def fit_predict(  # type: ignore[override]
        self, X, y=None, input_is_packed: bool = False, n_features: int | None = None
    ):
        return super().fit_predict(
            X, y, input_is_packed=input_is_packed, n_features=n_features
        )

    def predict(  # type: ignore[override]
        self, X, input_is_packed: bool = False, n_features: int | None = None
    ):
        return super().predict(X, input_is_packed=input_is_packed, n_features=n_features)

    def transform(  # type: ignore[override]
        self, X, input_is_packed: bool = False, n_features: int | None = None
    ):
        return super().transform(
            X, input_is_packed=input_is_packed, n_features=n_features
        )
