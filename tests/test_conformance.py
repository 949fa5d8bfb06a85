r"""Conformance of the exact engine against reference golden cluster fixtures.

The golden id lists are deterministic outputs of the BitBIRCH algorithm on
seeded synthetic fingerprints and are identical to the fixtures the reference
implementation validates against — matching them proves serial-equivalent,
bit-exact label parity.
"""

import numpy as np

from bblean_tpu import BitBirch
from bblean_tpu.fingerprints import make_fake_fingerprints, unpack_fingerprints

SEED = 12620509540149709235

DIAMETER_TOP13 = [
    [2195, 2196, 2378, 2440, 2443, 2454, 2463, 2464, 2465, 2467, 2527, 2544],
    [199, 228, 255, 270, 273, 438, 457, 458, 461, 470, 477, 496],
    [700, 728, 773, 798, 825, 891, 919, 962, 963, 968, 998],
    [1448, 1567, 1590, 1606, 1612, 1637, 1640, 1648, 1686, 1694],
    [1059, 1065, 1072, 1077, 1154, 1194, 1301],
    [1779, 1802, 1807, 1828, 1856, 1864],
    [2826, 2896, 2970, 2973, 2975],
    [1986, 2107, 2139, 2141],
    [1933, 1949],
    [2233, 2294],
    [1551, 1552],
    [1219, 1226],
    [614, 637],
]

RADIUS_2_19 = [
    [749, 751, 766, 798, 825, 827, 840, 845],
    [463, 464, 470, 477, 496, 498],
    [0, 3, 32, 53],
    [607, 609, 614, 615],
    [542, 557, 560, 561],
    [30, 36, 45],
    [647, 650, 652],
    [689, 694, 745],
    [762, 764, 773],
    [771, 775, 789],
    [520, 522, 551],
    [60, 66, 99],
    [248, 389, 390],
    [336, 391, 405],
    [199, 230, 231],
    [71, 125],
    [82, 155],
]

TOLERANCE_LEGACY_TOP4 = [
    [182, 255, 311, 389, 405, 438, 457, 461, 470],
    [107, 228],
    [13],
    [0],
]


def test_diameter_consistency_packed_and_unpacked() -> None:
    fps = make_fake_fingerprints(3000, n_features=2048, seed=SEED, pack=True)
    tree = BitBirch(branching_factor=50, threshold=0.65, merge_criterion="diameter")
    tree.fit(fps, n_features=2048)
    assert tree.get_cluster_mol_ids()[:13] == DIAMETER_TOP13

    unpacked = unpack_fingerprints(fps, n_features=2048)
    tree = BitBirch(branching_factor=50, threshold=0.65, merge_criterion="diameter")
    tree.fit(unpacked, n_features=2048, input_is_packed=False)
    assert tree.get_cluster_mol_ids()[:13] == DIAMETER_TOP13


def test_radius_consistency() -> None:
    fps = make_fake_fingerprints(1000, n_features=2048, seed=SEED, pack=True)
    tree = BitBirch(merge_criterion="radius", threshold=0.65, branching_factor=50)
    tree.fit(fps, n_features=2048)
    assert tree.get_cluster_mol_ids()[2:19] == RADIUS_2_19


def test_tolerance_legacy_consistency() -> None:
    fps = make_fake_fingerprints(500, n_features=2048, seed=SEED, pack=True)
    tree = BitBirch(
        merge_criterion="tolerance-legacy",
        branching_factor=50,
        threshold=0.65,
        tolerance=0.05,
    )
    tree.fit(fps, n_features=2048)
    assert tree.get_cluster_mol_ids()[:4] == TOLERANCE_LEGACY_TOP4


def test_fit_from_file_matches_array(tmp_path) -> None:
    fps = make_fake_fingerprints(300, n_features=2048, seed=SEED)
    path = tmp_path / "fps.npy"
    np.save(path, fps)
    t1 = BitBirch().fit(fps)
    t2 = BitBirch().fit(path)
    assert t1.get_cluster_mol_ids() == t2.get_cluster_mol_ids()


def test_assignments_roundtrip() -> None:
    fps = make_fake_fingerprints(200, seed=SEED)
    tree = BitBirch(threshold=0.3).fit(fps)
    labels = tree.get_assignments()
    mol_ids = tree.get_cluster_mol_ids()
    assert labels.shape == (200,)
    for i, mols in enumerate(mol_ids, 1):
        assert (labels[mols] == i).all()
