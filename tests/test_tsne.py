r"""JAX-native t-SNE + visualization-path smoke tests.

The reference relies on openTSNE/umap (absent in this image); here the
device t-SNE is tested directly for embedding quality (well-separated blobs
must stay separated in 2-D), and the umap path is smoke-tested through a
stub module so the plotting code path is exercised rdkit/umap-free.
"""

import sys
import types

import numpy as np
import pytest

from bblean_tpu.ops.tsne import tsne_embed


def _blobs(n_per: int = 60, n_blobs: int = 4, dim: int = 64, seed: int = 0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=8.0, size=(n_blobs, dim))
    pts = np.concatenate(
        [c + rng.normal(scale=0.5, size=(n_per, dim)) for c in centers]
    )
    labels = np.repeat(np.arange(n_blobs), n_per)
    return pts.astype(np.float32), labels


def _separation_score(emb: np.ndarray, labels: np.ndarray) -> float:
    r"""Fraction of points whose nearest neighbour shares their label."""
    d2 = ((emb[:, None] - emb[None, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nn = d2.argmin(1)
    return float((labels[nn] == labels).mean())


def test_tsne_separates_blobs() -> None:
    pts, labels = _blobs()
    emb = tsne_embed(pts, perplexity=20, n_iter=400, seed=1)
    assert emb.shape == (len(pts), 2)
    assert np.isfinite(emb).all()
    assert _separation_score(emb, labels) > 0.95


def test_tsne_multiscale_and_knobs() -> None:
    pts, labels = _blobs(n_per=40, n_blobs=3)
    emb = tsne_embed(
        pts, perplexity=15, n_iter=300, multiscale=True,
        exaggeration=1.5, dof=0.8, do_pca_init=False, seed=3,
    )
    assert emb.shape == (len(pts), 2)
    assert _separation_score(emb, labels) > 0.9


def test_tsne_deterministic_with_pca_init() -> None:
    pts, _ = _blobs(n_per=30, n_blobs=3)
    a = tsne_embed(pts, n_iter=100, seed=5)
    b = tsne_embed(pts, n_iter=100, seed=5)
    assert np.allclose(a, b)


def test_tsne_rejects_tiny_input() -> None:
    with pytest.raises(ValueError):
        tsne_embed(np.zeros((2, 8), np.float32))


@pytest.fixture()
def analysis():
    from bblean_tpu.analysis import cluster_analysis
    from bblean_tpu.fingerprints import make_fake_fingerprints

    fps = make_fake_fingerprints(120, seed=9)
    clusters = [list(range(i * 30, (i + 1) * 30)) for i in range(4)]
    return cluster_analysis(clusters, fps=fps, top=4)


def test_tsne_plot_smoke(analysis, tmp_path) -> None:
    import matplotlib

    matplotlib.use("Agg")
    from bblean_tpu.plotting import tsne_plot

    out = tmp_path / "tsne.png"
    tsne_plot(analysis, output=out, perplexity=10)
    assert out.exists() and out.stat().st_size > 0


def test_umap_plot_smoke_with_stub(analysis, tmp_path, monkeypatch) -> None:
    r"""Exercise the umap plotting path with a stub module (umap-learn is
    not installed in this image)."""
    import matplotlib

    matplotlib.use("Agg")

    class _StubUMAP:
        def __init__(self, n_components=2, random_state=None):
            self.n = n_components

        def fit_transform(self, x):
            rng = np.random.default_rng(0)
            return rng.normal(size=(len(x), self.n)).astype(np.float32)

    stub = types.ModuleType("umap")
    stub.UMAP = _StubUMAP
    monkeypatch.setitem(sys.modules, "umap", stub)
    from bblean_tpu.plotting import umap_plot

    out = tmp_path / "umap.png"
    umap_plot(analysis, output=out)
    assert out.exists() and out.stat().st_size > 0


def _install_opentsne_stub(monkeypatch) -> None:
    r"""Minimal openTSNE surface: TSNE with .fit, a parent-class .fit used
    by the multiscale path via super(), and affinity.Multiscale."""

    class _BaseTSNE:
        def fit(self, x, affinities=None, initialization=None):
            rng = np.random.default_rng(1)
            return rng.normal(size=(len(x), 2)).astype(np.float32)

    class _StubTSNE(_BaseTSNE):
        def __init__(
            self,
            n_components=2,
            perplexity=30.0,
            random_state=None,
            dof=1.0,
            exaggeration=None,
            negative_gradient_method="fft",
            initialization="pca",
        ):
            assert n_components == 2
            self.perplexity = perplexity

        def fit(self, x):
            rng = np.random.default_rng(2)
            return rng.normal(size=(len(x), 2)).astype(np.float32)

    class _StubMultiscale:
        def __init__(self, data=None, perplexities=None, random_state=None):
            self.perplexities = perplexities

    mod = types.ModuleType("openTSNE")
    mod.TSNE = _StubTSNE
    aff = types.ModuleType("openTSNE.affinity")
    aff.Multiscale = _StubMultiscale
    mod.affinity = aff
    monkeypatch.setitem(sys.modules, "openTSNE", mod)
    monkeypatch.setitem(sys.modules, "openTSNE.affinity", aff)


def test_tsne_plot_opentsne_branch_with_stub(
    analysis, tmp_path, monkeypatch
) -> None:
    r"""The openTSNE-preferred branch executes when the package imports."""
    import matplotlib

    matplotlib.use("Agg")
    _install_opentsne_stub(monkeypatch)
    from bblean_tpu.plotting import tsne_plot

    out = tmp_path / "tsne-ot.png"
    tsne_plot(analysis, output=out, perplexity=10)
    assert out.exists() and out.stat().st_size > 0


def test_tsne_plot_opentsne_multiscale_with_stub(
    analysis, tmp_path, monkeypatch
) -> None:
    import matplotlib

    matplotlib.use("Agg")
    _install_opentsne_stub(monkeypatch)
    from bblean_tpu.plotting import tsne_plot

    out = tmp_path / "tsne-ot-ms.png"
    tsne_plot(analysis, output=out, perplexity=10, multiscale=True)
    assert out.exists() and out.stat().st_size > 0
