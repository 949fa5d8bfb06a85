r"""CLI integration tests (click CliRunner in tmp dirs), mirroring the
reference's typer CliRunner strategy."""

import json
import pickle
from pathlib import Path

import numpy as np
import pytest
from click.testing import CliRunner

from bblean_tpu.cli import main
from bblean_tpu.fingerprints import make_fake_fingerprints

SEED = 12620509540149709235


@pytest.fixture()
def runner():
    return CliRunner()


@pytest.fixture()
def fps_file(tmp_path):
    fps = make_fake_fingerprints(300, seed=SEED)
    path = tmp_path / "fps.npy"
    np.save(path, fps)
    return path


def _check_run_artifacts(out_dir: Path, n_mols: int, centroids: bool = True):
    with open(out_dir / "clusters.pkl", "rb") as f:
        clusters = pickle.load(f)
    flat = sorted(i for c in clusters for i in c)
    assert flat == list(range(n_mols))
    assert (out_dir / "config.json").exists()
    assert (out_dir / "timings.json").exists()
    assert (out_dir / "input-fps").is_dir()
    if centroids:
        assert (out_dir / "cluster-centroids-packed.pkl").exists()
    return clusters


def test_run_basic(runner, fps_file, tmp_path) -> None:
    out = tmp_path / "out"
    result = runner.invoke(
        main,
        ["run", str(fps_file), "-o", str(out), "-t", "0.3", "--no-monitor-mem", "-V"],
    )
    assert result.exit_code == 0, result.output
    clusters = _check_run_artifacts(out, 300)
    # Sorted by size desc
    sizes = [len(c) for c in clusters]
    assert sizes == sorted(sizes, reverse=True)
    config = json.loads((out / "config.json").read_text())
    assert config["threshold"] == 0.3
    assert config["engine"] == "exact"


def test_run_matches_library(runner, fps_file, tmp_path) -> None:
    from bblean_tpu import BitBirch

    out = tmp_path / "out"
    result = runner.invoke(
        main,
        ["run", str(fps_file), "-o", str(out), "-t", "0.3", "-b", "254",
         "--no-monitor-mem", "-V"],
    )
    assert result.exit_code == 0, result.output
    with open(out / "clusters.pkl", "rb") as f:
        clusters = pickle.load(f)
    tree = BitBirch(threshold=0.3, branching_factor=254).fit(fps_file)
    assert clusters == tree.get_cluster_mol_ids()


def test_run_with_refinement(runner, fps_file, tmp_path) -> None:
    out = tmp_path / "out"
    result = runner.invoke(
        main,
        ["run", str(fps_file), "-o", str(out), "-t", "0.3",
         "--refine-num", "1", "--no-monitor-mem", "-V"],
    )
    assert result.exit_code == 0, result.output
    _check_run_artifacts(out, 300)


def test_run_batch_engine(runner, fps_file, tmp_path) -> None:
    out = tmp_path / "out"
    result = runner.invoke(
        main,
        ["run", str(fps_file), "-o", str(out), "-t", "0.3",
         "--engine", "batch", "--no-monitor-mem", "-V"],
    )
    assert result.exit_code == 0, result.output
    clusters = _check_run_artifacts(out, 300)
    sizes = [len(c) for c in clusters]
    assert sizes == sorted(sizes, reverse=True)


def test_run_dir_input(runner, tmp_path) -> None:
    d = tmp_path / "inputs"
    d.mkdir()
    for s in (1, 2):
        np.save(d / f"f{s}.npy", make_fake_fingerprints(100, seed=s))
    out = tmp_path / "out"
    result = runner.invoke(
        main, ["run", str(d), "-o", str(out), "-t", "0.3", "--no-monitor-mem", "-V"]
    )
    assert result.exit_code == 0, result.output
    _check_run_artifacts(out, 200)


def test_multiround_cli(runner, tmp_path) -> None:
    d = tmp_path / "inputs"
    d.mkdir()
    for s in (1, 3, 5, 7):
        np.save(d / f"f{s}.npy", make_fake_fingerprints(80, seed=s))
    out = tmp_path / "out"
    result = runner.invoke(
        main,
        ["multiround", str(d), "-o", str(out), "-t", "0.65", "-p", "2",
         "--bin-size", "2", "--no-monitor-mem", "-V"],
    )
    assert result.exit_code == 0, result.output
    _check_run_artifacts(out, 320)


def test_fps_info(runner, fps_file) -> None:
    result = runner.invoke(main, ["fps-info", str(fps_file)])
    assert result.exit_code == 0, result.output
    assert "Valid fingerprint file" in result.output
    assert "300" in result.output


def test_fps_split_and_merge(runner, fps_file, tmp_path) -> None:
    out = tmp_path / "shards"
    result = runner.invoke(
        main, ["fps-split", str(fps_file), "-n", "4", "-o", str(out)]
    )
    assert result.exit_code == 0, result.output
    shards = sorted(out.glob("*.npy"))
    assert len(shards) == 4

    merged_path = tmp_path / "merged.npy"
    result = runner.invoke(
        main, ["fps-merge", *map(str, shards), "-o", str(merged_path)]
    )
    assert result.exit_code == 0, result.output
    assert (np.load(merged_path) == np.load(fps_file)).all()


def test_fps_shuffle(runner, fps_file) -> None:
    result = runner.invoke(main, ["fps-shuffle", str(fps_file), "--seed", "3"])
    assert result.exit_code == 0, result.output
    shuffled = np.load(fps_file.with_name("fps.shuffled.npy"))
    original = np.load(fps_file)
    assert shuffled.shape == original.shape
    assert not (shuffled == original).all()
    assert (
        np.sort(shuffled.sum(1).astype(np.int64))
        == np.sort(original.sum(1).astype(np.int64))
    ).all()


def test_summary(runner, fps_file, tmp_path) -> None:
    out = tmp_path / "out"
    runner.invoke(
        main, ["run", str(fps_file), "-o", str(out), "-t", "0.3", "--no-monitor-mem", "-V"]
    )
    result = runner.invoke(main, ["summary", str(out), "--top", "5", "--chi"])
    assert result.exit_code == 0, result.output
    assert "Total fingerprints: 300" in result.output
    assert "CHI" in result.output


def test_plot_summary_and_pops(runner, fps_file, tmp_path) -> None:
    out = tmp_path / "out"
    runner.invoke(
        main, ["run", str(fps_file), "-o", str(out), "-t", "0.3", "--no-monitor-mem", "-V"]
    )
    for cmd in ("plot-summary", "plot-pops", "plot-pca"):
        result = runner.invoke(main, [cmd, str(out)])
        assert result.exit_code == 0, f"{cmd}: {result.output}"
    assert (out / "summary.png").exists()
    assert (out / "pops.png").exists()
    assert (out / "pca.png").exists()


def test_run_overwrite_protection(runner, fps_file, tmp_path) -> None:
    out = tmp_path / "out"
    r1 = runner.invoke(
        main, ["run", str(fps_file), "-o", str(out), "--no-monitor-mem", "-V"]
    )
    assert r1.exit_code == 0
    r2 = runner.invoke(
        main, ["run", str(fps_file), "-o", str(out), "--no-monitor-mem", "-V"]
    )
    assert r2.exit_code != 0
    r3 = runner.invoke(
        main,
        ["run", str(fps_file), "-o", str(out), "--overwrite", "--no-monitor-mem", "-V"],
    )
    assert r3.exit_code == 0, r3.output


def test_fps_from_smiles_requires_rdkit(runner, tmp_path) -> None:
    smi = tmp_path / "mols.smi"
    smi.write_text("CCO\nCCC\n")
    result = runner.invoke(main, ["fps-from-smiles", str(smi), "-o", str(tmp_path)])
    try:
        import rdkit  # noqa: F401

        assert result.exit_code == 0, result.output
    except ImportError:
        assert result.exit_code != 0
        assert isinstance(result.exception, ImportError)


def test_run_batch_engine_refine(runner, fps_file, tmp_path) -> None:
    out = tmp_path / "out-batch-refine"
    result = runner.invoke(
        main,
        ["run", str(fps_file), "-o", str(out), "-t", "0.3",
         "--engine", "batch", "--refine-num", "2", "--no-monitor-mem", "-V"],
    )
    assert result.exit_code == 0, result.output
    import pickle

    with open(out / "clusters.pkl", "rb") as f:
        clusters = pickle.load(f)
    flat = sorted(i for c in clusters for i in c)
    n_total = len(flat)
    assert flat == list(range(n_total))
    # size-descending order preserved through refinement
    sizes = [len(c) for c in clusters]
    assert sizes == sorted(sizes, reverse=True)


def test_run_sharded_engine(runner, fps_file, tmp_path) -> None:
    r"""bb run --engine sharded produces a consistent clusters.pkl over the
    virtual 8-device mesh."""
    out = tmp_path / "out-sharded"
    result = runner.invoke(
        main,
        ["run", str(fps_file), "-o", str(out), "-t", "0.3",
         "--engine", "sharded", "--batch-size", "64", "--no-monitor-mem",
         "-V"],
    )
    assert result.exit_code == 0, result.output
    import pickle

    with open(out / "clusters.pkl", "rb") as f:
        clusters = pickle.load(f)
    flat = sorted(i for c in clusters for i in c)
    assert flat == list(range(len(flat)))
    sizes = [len(c) for c in clusters]
    assert sizes == sorted(sizes, reverse=True)
    import json

    cfg = json.loads((out / "config.json").read_text())
    assert cfg["n_devices"] == 8
