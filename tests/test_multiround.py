r"""Multiround pipeline tests: parallel == serial, golden clusters.

The golden list is the deterministic output of the pipeline on seeded
synthetic shards (identical to the reference's multiround fixture).
"""

import pickle
from pathlib import Path

import numpy as np
import pytest

from bblean_tpu.fingerprints import make_fake_fingerprints
from bblean_tpu.multiround import run_multiround_bitbirch

EXPECT_TOP2 = [
    [368, 414, 422, 423, 520, 549, 581, 609, 625, 683, 622, 709, 761, 770,
     789, 813, 831, 989],
    [23, 285, 209, 213, 276, 294, 316, 319, 358],
]


def _make_shards(dir: Path) -> list[Path]:
    for seed in range(1, 21, 2):
        fps = make_fake_fingerprints(100, seed=seed)
        np.save(dir / f"fps.{str(seed).zfill(4)}.npy", fps)
    return sorted(dir.glob("*.npy"))


@pytest.mark.parametrize("num_processes", [1, 4])
def test_multiround_golden(tmp_path, num_processes) -> None:
    files = _make_shards(tmp_path)
    out_dir = tmp_path / f"output-{num_processes}"
    out_dir.mkdir()
    run_multiround_bitbirch(
        files,
        out_dir,
        num_initial_processes=num_processes,
        bin_size=2,
        threshold=0.65,
        midsection_merge_criterion="tolerance-legacy",
    )
    with open(out_dir / "clusters.pkl", "rb") as f:
        clusters = pickle.load(f)
    assert clusters[:2] == EXPECT_TOP2
    # Singleton tail sanity
    assert all(len(c) == 1 for c in clusters[2:20])
    # Every molecule appears exactly once
    flat = sorted(i for c in clusters for i in c)
    assert flat == list(range(1000))
    # Intermediates cleaned up; artifacts exist
    assert not list(out_dir.glob("round-*"))
    assert (out_dir / "cluster-centroids-packed.pkl").exists()


def test_multiround_no_refinement(tmp_path) -> None:
    files = _make_shards(tmp_path)
    out_dir = tmp_path / "output-none"
    out_dir.mkdir()
    run_multiround_bitbirch(
        files,
        out_dir,
        num_initial_processes=1,
        bin_size=3,
        threshold=0.65,
        refinement_before_midsection="none",
        save_centroids=False,
        cleanup=False,
    )
    with open(out_dir / "clusters.pkl", "rb") as f:
        clusters = pickle.load(f)
    flat = sorted(i for c in clusters for i in c)
    assert flat == list(range(1000))
    # cleanup=False keeps round files
    assert list(out_dir.glob("round-1-bufs*.npy"))
