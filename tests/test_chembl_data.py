r"""Real-data (ChEMBL sample) conformance, gated on RDKit availability.

The ``.smi`` fixtures are vendored from the reference test suite
(``/root/reference/tests/chembl-sample-3k.smi`` and ``-bad.smi``); the golden
packed-byte prefixes below are the reference's own expected values
(``/root/reference/tests/test_cli.py:160-203``), so the moment an image
ships RDKit these light up as a true cross-implementation check.
"""

from pathlib import Path

import numpy as np
import pytest

rdkit = pytest.importorskip("rdkit")

DATA = Path(__file__).parent / "data"

# First 19 nonzero packed bytes of the ECFP4 fingerprints of the 3k sample
# (reference golden, test_cli.py:174-175)
GOLDEN_3K_NONZERO_PREFIX = [
    4, 128, 2, 16, 8, 16, 4, 16, 128, 16, 1, 128, 1, 64, 1, 1, 128, 32, 32,
]
# Same for the bad sample with skip_invalid + minimal sanitization
# (reference golden, test_cli.py:201-202)
GOLDEN_BAD_NONZERO_PREFIX = [
    2, 4, 32, 1, 2, 128, 4, 128, 32, 32, 80, 128, 64, 128, 1, 16, 64, 4, 16,
]


def test_fps_from_smiles_golden_bytes() -> None:
    from bblean_tpu.fingerprints import fps_from_smiles
    from bblean_tpu.smiles import load_smiles

    smiles = load_smiles(DATA / "chembl-sample-3k.smi")
    fps = fps_from_smiles(smiles, kind="ecfp4", pack=True)
    flat = np.asarray(fps).reshape(-1)
    actual = flat[flat.nonzero()[0]][:19].tolist()
    assert actual == GOLDEN_3K_NONZERO_PREFIX


def test_fps_from_bad_smiles_skip_invalid() -> None:
    from bblean_tpu.fingerprints import fps_from_smiles
    from bblean_tpu.smiles import load_smiles

    smiles = load_smiles(DATA / "chembl-sample-bad.smi")
    fps, invalid = fps_from_smiles(
        smiles, kind="ecfp4", pack=True, sanitize="minimal", skip_invalid=True
    )
    assert len(invalid) > 0
    flat = np.asarray(fps).reshape(-1)
    actual = flat[flat.nonzero()[0]][:19].tolist()
    assert actual == GOLDEN_BAD_NONZERO_PREFIX


def test_chembl_cluster_engines_agree(monkeypatch) -> None:
    r"""Real-data clustering: the native engine must be bit-identical to the
    Python exact oracle on ChEMBL fingerprints at the CLI default t=0.3."""
    from bblean_tpu.fingerprints import fps_from_smiles
    from bblean_tpu.smiles import load_smiles
    from bblean_tpu.tree import BitBirch

    smiles = load_smiles(DATA / "chembl-sample-3k.smi")
    fps = fps_from_smiles(smiles, kind="ecfp4", pack=True)

    ids = {}
    for engine, no_ext in (("python", "1"), ("native", "0")):
        monkeypatch.setenv("BBLEAN_TPU_NO_EXTENSIONS", no_ext)
        tree = BitBirch(threshold=0.3, branching_factor=254)
        tree.fit(fps)
        ids[engine] = tree.get_cluster_mol_ids()
    assert ids["python"] == ids["native"]
