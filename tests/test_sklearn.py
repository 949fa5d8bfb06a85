r"""sklearn adapter contract tests."""

import numpy as np
import pytest

from bblean_tpu.fingerprints import make_fake_fingerprints, unpack_fingerprints
from bblean_tpu.sklearn import BitBirch, UnpackedBitBirch

SEED = 12620509540149709235


@pytest.fixture(scope="module")
def fps():
    return make_fake_fingerprints(200, seed=SEED)


def test_fit_sets_sklearn_attrs(fps) -> None:
    est = BitBirch(threshold=0.3)
    est.fit(fps)
    n = len(est.subcluster_labels_)
    assert est.subcluster_centers_.shape == (n, 2048)
    assert (est.subcluster_labels_ == np.arange(1, n + 1)).all()
    assert est.labels_.shape == (200,)
    assert est._n_features_out == n


def test_fit_predict_matches_assignments(fps) -> None:
    est = BitBirch(threshold=0.3)
    labels = est.fit_predict(fps)
    assert (labels == est.get_assignments()).all()


def test_predict_on_training_data(fps) -> None:
    est = BitBirch(threshold=0.3).fit(fps)
    pred = est.predict(fps)
    # Predictions are valid labels; most training fps land on their own
    # cluster's centroid (not guaranteed for all: predict is nearest-centroid)
    assert set(pred) <= set(est.subcluster_labels_)
    agreement = (pred == est.labels_).mean()
    assert agreement > 0.5


def test_transform_shape(fps) -> None:
    est = BitBirch(threshold=0.3).fit(fps)
    d = est.transform(fps[:10])
    assert d.shape == (10, len(est.subcluster_labels_))
    assert (d >= 0).all() and (d <= 1).all()


def test_get_set_params() -> None:
    est = BitBirch(threshold=0.4, branching_factor=30)
    params = est.get_params()
    assert params["threshold"] == 0.4
    assert params["branching_factor"] == 30
    est.set_params(threshold=0.5)
    assert est.threshold == 0.5


def test_unpacked_variant(fps) -> None:
    unpacked = unpack_fingerprints(fps)
    a = BitBirch(threshold=0.3).fit(fps)
    b = UnpackedBitBirch(threshold=0.3).fit(unpacked)
    assert (a.labels_ == b.labels_).all()
    pred = b.predict(unpacked[:20])
    assert pred.shape == (20,)


def test_partial_fit(fps) -> None:
    est = BitBirch(threshold=0.3)
    est.partial_fit(fps[:100])
    est.partial_fit(fps[100:])
    assert est.num_fitted_fps == 200
    assert est.labels_.shape == (200,)
