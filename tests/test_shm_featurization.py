r"""Shared-memory single-output-file featurization (rdkit-free stub test).

Covers the parallel-into-one-array path (``bb fps-from-smiles -p N
--single-file``; reference semantics ``bblean/cli.py:1652-1701``). RDKit is
stubbed with a deterministic fake featurizer, and the worker pool is run
in-process so the stubs apply, exercising the shared-memory plumbing,
disjoint-range writes, and invalid-row compaction end to end.
"""

import hashlib

import numpy as np
import pytest
from click.testing import CliRunner

import bblean_tpu.fingerprints as fpmod
from bblean_tpu.cli import main


class _FakeMol:
    def __init__(self, smi: str) -> None:
        self.smi = smi


def _fake_mol_from_smiles(smi, sanitize=False):
    return None if smi.startswith("BAD") else _FakeMol(smi)


def _fake_sanitize(mol, sanitizeOps=None):
    if mol.smi.startswith("UGLY"):
        raise ValueError("unsanitizable")


def _smi_bits(smi: str, n_features: int) -> np.ndarray:
    # Deterministic pseudo-fingerprint from the smiles text
    seed = int.from_bytes(hashlib.sha256(smi.encode()).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return (rng.random(n_features) < 0.25).astype(np.uint8)


class _FakeGenerator:
    def __init__(self, n_features: int) -> None:
        self.n = n_features

    def GetFingerprintAsNumPy(self, mol):
        return _smi_bits(mol.smi, self.n)


class _SerialPool:
    r"""Pool stand-in running everything in-process (so stubs apply)."""

    def __init__(self, processes=None) -> None:
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def map(self, fn, it):
        return [fn(x) for x in it]

    def starmap(self, fn, it):
        return [fn(*args) for args in it]


class _FakeCtx:
    def Pool(self, processes=None):
        return _SerialPool()


@pytest.fixture
def stub_rdkit(monkeypatch):
    # raising=False: these names are undefined when rdkit is absent
    monkeypatch.setattr(
        fpmod, "MolFromSmiles", _fake_mol_from_smiles, raising=False
    )
    monkeypatch.setattr(fpmod, "SanitizeMol", _fake_sanitize, raising=False)
    monkeypatch.setattr(fpmod, "_require_rdkit", lambda: None)
    monkeypatch.setattr(
        fpmod, "_get_generator", lambda kind, n: _FakeGenerator(n)
    )
    monkeypatch.setattr(fpmod, "_get_sanitize_flags", lambda s: None)
    monkeypatch.setattr(fpmod, "_HAS_RDKIT", True)
    import multiprocessing

    monkeypatch.setattr(
        multiprocessing, "get_context", lambda method=None: _FakeCtx()
    )


def _write_smi(path, smiles):
    path.write_text("\n".join(smiles) + "\n")


def test_filler_writes_disjoint_ranges(stub_rdkit, tmp_path) -> None:
    r"""Direct worker test: two range-disjoint calls fill one shm array."""
    import multiprocessing.shared_memory as shmem

    smiles = [f"C{i}" for i in range(10)]
    n_features = 64
    fps_shm = shmem.SharedMemory(create=True, size=10 * 8)
    mask_shm = shmem.SharedMemory(create=True, size=10)
    try:
        np.ndarray((10,), np.bool_, buffer=mask_shm.buf)[:] = False
        filler = fpmod._FingerprintArrayFiller(
            invalid_mask_shmem_name=mask_shm.name,
            shmem_name=fps_shm.name,
            kind="ecfp4",
            fp_size=n_features,
            pack=True,
            dtype="uint8",
            num_smiles=10,
            sanitize="all",
            skip_invalid=False,
        )
        filler((0, 6), smiles[:6])
        filler((6, 10), smiles[6:])
        got = np.ndarray((10, 8), np.uint8, buffer=fps_shm.buf).copy()
    finally:
        fps_shm.close()
        fps_shm.unlink()
        mask_shm.close()
        mask_shm.unlink()
    expect = np.stack(
        [np.packbits(_smi_bits(s, n_features)) for s in smiles]
    )
    assert (got == expect).all()


def test_cli_single_file_mode(stub_rdkit, tmp_path) -> None:
    smiles = [f"C{i}" for i in range(50)]
    smi_path = tmp_path / "in.smi"
    _write_smi(smi_path, smiles)
    out = tmp_path / "out"
    result = CliRunner().invoke(
        main,
        [
            "fps-from-smiles", str(smi_path), "-o", str(out),
            "-p", "2", "--single-file", "--batch-size", "16",
            "--n-features", "128", "-V",
        ],
    )
    assert result.exit_code == 0, result.output
    fps = np.load(out / "fps.npy")
    assert fps.shape == (50, 16)
    expect = np.stack([np.packbits(_smi_bits(s, 128)) for s in smiles])
    assert (fps == expect).all()


def test_cli_single_file_skips_invalid(stub_rdkit, tmp_path) -> None:
    smiles = ["C0", "BAD1", "C2", "UGLY3", "C4"]
    smi_path = tmp_path / "in.smi"
    _write_smi(smi_path, smiles)
    out = tmp_path / "out"
    result = CliRunner().invoke(
        main,
        [
            "fps-from-smiles", str(smi_path), "-o", str(out),
            "-p", "2", "--single-file", "--batch-size", "2",
            "--n-features", "64", "--skip-invalid", "-V",
        ],
    )
    assert result.exit_code == 0, result.output
    fps = np.load(out / "fps.npy")
    assert fps.shape == (3, 8)
    invalid = np.load(out / "invalid-fps.npy")
    assert invalid.tolist() == [1, 3]
    expect = np.stack(
        [np.packbits(_smi_bits(s, 64)) for s in ("C0", "C2", "C4")]
    )
    assert (fps == expect).all()
