r"""Cluster metrics (CHI/DBI/Dunn) and cluster_analysis tests."""

import numpy as np
import pytest

from bblean_tpu import BitBirch
from bblean_tpu.analysis import cluster_analysis
from bblean_tpu.fingerprints import make_fake_fingerprints, unpack_fingerprints
from bblean_tpu.metrics import jt_dbi, jt_isim_chi, jt_isim_dunn
from bblean_tpu.similarity import jt_isim

SEED = 12620509540149709235


@pytest.fixture(scope="module")
def clustered():
    fps = make_fake_fingerprints(300, seed=SEED)
    tree = BitBirch(threshold=0.3).fit(fps)
    ids = tree.get_cluster_mol_ids()
    cluster_fps = [fps[c] for c in ids if len(c) >= 2][:10]
    return fps, ids, cluster_fps


def test_chi(clustered) -> None:
    _, _, cluster_fps = clustered
    chi = jt_isim_chi(cluster_fps)
    assert np.isfinite(chi)
    assert chi > 0
    # Single cluster -> 0
    assert jt_isim_chi(cluster_fps[:1]) == 0


def test_chi_packed_unpacked_agree(clustered) -> None:
    _, _, cluster_fps = clustered
    unpacked = [unpack_fingerprints(c) for c in cluster_fps]
    a = jt_isim_chi(cluster_fps)
    b = jt_isim_chi(unpacked, input_is_packed=False)
    assert np.isclose(a, b)


def test_dbi(clustered) -> None:
    _, _, cluster_fps = clustered
    dbi = jt_dbi(cluster_fps)
    assert np.isfinite(dbi)
    assert dbi > 0
    # Medoid centrals also work
    dbi_m = jt_dbi(cluster_fps, centrals="medoid")
    assert np.isfinite(dbi_m)


def test_dunn(clustered) -> None:
    _, _, cluster_fps = clustered
    dunn = jt_isim_dunn(cluster_fps)
    assert np.isfinite(dunn)
    assert dunn >= 0
    unpacked = [unpack_fingerprints(c) for c in cluster_fps]
    assert np.isclose(dunn, jt_isim_dunn(unpacked, input_is_packed=False))


def test_cluster_analysis_array(clustered) -> None:
    fps, ids, _ = clustered
    ca = cluster_analysis(ids, fps=fps, top=5)
    assert ca.clusters_num == 5
    assert ca.total_fps == 300
    assert ca.all_clusters_num == len(ids)
    assert len(ca.isims) == 5
    for isim_val, members in zip(ca.isims, ids[:5]):
        if len(members) >= 2:
            assert np.isclose(isim_val, jt_isim(fps[sorted(members)]))
    top_fps = ca.get_top_cluster_fps()
    assert len(top_fps) == 5
    assert all(len(f) == len(c) for f, c in zip(top_fps, ids[:5]))


def test_cluster_analysis_from_file(tmp_path, clustered) -> None:
    fps, ids, _ = clustered
    p = tmp_path / "fps.npy"
    np.save(p, fps)
    ca = cluster_analysis(ids, fps=p, top=3)
    assert ca.clusters_num == 3
    assert ca.has_fps
    assert not ca.has_scaffolds


def test_cluster_analysis_stats(clustered) -> None:
    _, ids, _ = clustered
    ca = cluster_analysis(ids, top=None)
    assert ca.has_all_clusters
    sizes = [len(c) for c in ids]
    assert ca.all_clusters_max_size == max(sizes)
    assert ca.all_clusters_min_size == min(sizes)
    assert ca.all_singletons_num == sum(1 for s in sizes if s == 1)
    assert ca.all_clusters_num_with_size_above(1) == sum(
        1 for s in sizes if s > 1
    )


def test_dump_metrics(tmp_path, clustered) -> None:
    import pandas as pd

    fps, ids, _ = clustered
    ca = cluster_analysis(ids, fps=fps, top=4)
    out = tmp_path / "metrics.csv"
    ca.dump_metrics(out)
    df = pd.read_csv(out)
    assert list(df.columns) == ["labels", "sizes", "isim"]
    assert len(df) == 4
