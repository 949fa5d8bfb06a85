r"""Plotting of clustering results.

Parity notes: covers the reference plotting surface (``bblean/plotting.py``):
population KDE (``pops_plot`` ``:36``), summary bars with an iSIM twin axis
(``summary_plot`` ``:65-175``), and PCA / t-SNE / UMAP embeddings of the top
clusters (``:178-394``).  t-SNE uses scikit-learn (openTSNE is optional in
this environment); UMAP requires the optional ``umap-learn``.  All plots use
matplotlib's non-interactive Agg backend and write PNG files.
"""

from __future__ import annotations

import typing as tp
from pathlib import Path

import numpy as np
from numpy.typing import NDArray

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from bblean_tpu._config import TSNE_SEED
from bblean_tpu.analysis import ClusterAnalysis, cluster_analysis

__all__ = [
    "pops_plot",
    "summary_plot",
    "pca_plot",
    "tsne_plot",
    "umap_plot",
]


def pops_plot(
    cluster_sizes: tp.Sequence[int],
    output: Path | str | None = None,
    ax: tp.Any = None,
) -> tp.Any:
    r"""KDE of the cluster-size (population) distribution."""
    import seaborn as sns

    if ax is None:
        _fig, ax = plt.subplots(figsize=(8, 5))
    sizes = np.asarray(cluster_sizes)
    sns.kdeplot(sizes, ax=ax, fill=True, log_scale=sizes.max() > 100)
    ax.set_xlabel("Cluster size")
    ax.set_ylabel("Density")
    ax.set_title("Cluster population distribution")
    if output is not None:
        ax.figure.savefig(output, dpi=150, bbox_inches="tight")
        plt.close(ax.figure)
    return ax


def summary_plot(
    analysis: ClusterAnalysis,
    output: Path | str | None = None,
) -> tp.Any:
    r"""Bar plot of top-cluster sizes with an iSIM twin axis (and scaffold
    counts when available)."""
    fig, ax = plt.subplots(figsize=(10, 5))
    labels = [str(x) for x in analysis.labels]
    ax.bar(labels, analysis.sizes, color="#4878CF", label="size")
    ax.set_xlabel("Cluster")
    ax.set_ylabel("Size")
    if analysis.has_scaffolds:
        ax.bar(
            labels,
            analysis.unique_scaffolds_num,
            color="#EE854A",
            alpha=0.7,
            label="unique scaffolds",
        )
    if analysis.has_fps:
        ax2 = ax.twinx()
        ax2.plot(labels, analysis.isims, "o-", color="#D65F5F", label="iSIM")
        ax2.set_ylabel("iSIM")
        ax2.set_ylim(0, 1)
    ax.legend(loc="upper right")
    ax.set_title(
        f"Top {analysis.clusters_num} of {analysis.all_clusters_num} clusters"
        f" ({analysis.total_fps:,} fingerprints)"
    )
    if output is not None:
        fig.savefig(output, dpi=150, bbox_inches="tight")
        plt.close(fig)
    return ax


def _embed_and_scatter(
    embedding: NDArray[np.floating],
    cluster_sizes: tp.Sequence[int],
    title: str,
    output: Path | str | None,
) -> tp.Any:
    fig, ax = plt.subplots(figsize=(7, 6))
    labels = np.repeat(np.arange(len(cluster_sizes)), cluster_sizes)
    scatter = ax.scatter(
        embedding[:, 0], embedding[:, 1], c=labels, cmap="tab20", s=8, alpha=0.8
    )
    fig.colorbar(scatter, ax=ax, label="cluster")
    ax.set_title(title)
    if output is not None:
        fig.savefig(output, dpi=150, bbox_inches="tight")
        plt.close(fig)
    return ax


def pca_plot(
    analysis: ClusterAnalysis, output: Path | str | None = None
) -> tp.Any:
    r"""2-D PCA embedding of the top clusters' fingerprints."""
    from sklearn.decomposition import PCA

    fps = analysis.top_unpacked_fps.astype(np.float32)
    emb = PCA(n_components=2, random_state=TSNE_SEED).fit_transform(fps)
    return _embed_and_scatter(
        emb, analysis.sizes, "PCA of top clusters", output
    )


def tsne_plot(
    analysis: ClusterAnalysis,
    output: Path | str | None = None,
    perplexity: float = 30.0,
    pca_reduce: int | None = 50,
    exaggeration: float | None = None,
    do_pca_init: bool = True,
    multiscale: bool = False,
    dof: float = 1.0,
) -> tp.Any:
    r"""2-D t-SNE embedding of the top clusters' fingerprints.

    Prefers openTSNE when installed (bit-compatible with the reference's
    FFT path, ``bblean/plotting.py:297-394``); otherwise runs the
    accelerator-native JAX t-SNE (``bblean_tpu.ops.tsne``), which supports
    the same surface: PCA init, multiscale affinities, second-phase
    exaggeration, and the ``dof`` knob.
    """
    fps = analysis.top_unpacked_fps.astype(np.float32)
    if pca_reduce is not None and fps.shape[1] > pca_reduce:
        from sklearn.decomposition import PCA

        fps = PCA(
            n_components=min(pca_reduce, len(fps) - 1), random_state=TSNE_SEED
        ).fit_transform(fps)
    perplexity = min(perplexity, max((len(fps) - 1) / 3, 2))
    try:
        from openTSNE import TSNE as OpenTSNE
        from openTSNE.affinity import Multiscale

        tsne = OpenTSNE(
            n_components=2,
            perplexity=perplexity,
            random_state=TSNE_SEED,
            dof=dof,
            exaggeration=exaggeration,
            negative_gradient_method="fft",
            initialization="pca" if do_pca_init else "random",
        )
        if multiscale:
            emb = np.asarray(
                super(OpenTSNE, tsne).fit(
                    fps,
                    affinities=Multiscale(
                        data=fps,
                        perplexities=[perplexity, len(fps) / 100],
                        random_state=TSNE_SEED,
                    ),
                    initialization="pca" if do_pca_init else "random",
                )
            )
        else:
            emb = np.asarray(tsne.fit(fps))
    except ImportError:
        from bblean_tpu.ops.tsne import tsne_embed

        emb = tsne_embed(
            fps,
            perplexity=perplexity,
            exaggeration=exaggeration,
            seed=TSNE_SEED,
            do_pca_init=do_pca_init,
            multiscale=multiscale,
            dof=dof,
        )
    return _embed_and_scatter(
        emb, analysis.sizes, "t-SNE of top clusters", output
    )


def umap_plot(
    analysis: ClusterAnalysis, output: Path | str | None = None
) -> tp.Any:
    r"""2-D UMAP embedding of the top clusters (requires umap-learn)."""
    try:
        import umap
    except ImportError as e:
        raise ImportError(
            "umap-learn is required for UMAP plots but is not installed"
        ) from e
    fps = analysis.top_unpacked_fps.astype(np.float32)
    emb = umap.UMAP(n_components=2, random_state=TSNE_SEED).fit_transform(fps)
    return _embed_and_scatter(
        emb, analysis.sizes, "UMAP of top clusters", output
    )


def dump_mol_images(
    smiles: tp.Sequence[str],
    out_dir: Path | str,
    mols_per_row: int = 5,
    max_mols: int = 30,
) -> None:
    r"""Write an RDKit grid image of molecules (requires RDKit)."""
    from rdkit.Chem import Draw, MolFromSmiles  # Requires RDKit

    mols = [MolFromSmiles(s) for s in smiles[:max_mols]]
    img = Draw.MolsToGridImage(mols, molsPerRow=mols_per_row)
    out = Path(out_dir) / "mols.png"
    with open(out, "wb") as f:
        f.write(img.data if hasattr(img, "data") else img)


# -- CLI adapters: build the analysis from clusters + fps files ----------------


def _analysis_from_clusters(
    clusters: list[list[int]], fps: tp.Any, top: int
) -> ClusterAnalysis:
    return cluster_analysis(clusters, fps=fps, top=top)


def summary_plot_from_clusters(
    clusters: list[list[int]], fps: tp.Any, top: int, output: Path
) -> None:
    summary_plot(_analysis_from_clusters(clusters, fps, top), output=output)


def pops_plot_from_clusters(
    clusters: list[list[int]], fps: tp.Any, top: int, output: Path
) -> None:
    pops_plot([len(c) for c in clusters], output=output)


def pca_plot_from_clusters(
    clusters: list[list[int]], fps: tp.Any, top: int, output: Path
) -> None:
    _require_fps(fps, "plot-pca")
    pca_plot(_analysis_from_clusters(clusters, fps, top), output=output)


def tsne_plot_from_clusters(
    clusters: list[list[int]], fps: tp.Any, top: int, output: Path
) -> None:
    _require_fps(fps, "plot-tsne")
    tsne_plot(_analysis_from_clusters(clusters, fps, top), output=output)


def umap_plot_from_clusters(
    clusters: list[list[int]], fps: tp.Any, top: int, output: Path
) -> None:
    _require_fps(fps, "plot-umap")
    umap_plot(_analysis_from_clusters(clusters, fps, top), output=output)


def _require_fps(fps: tp.Any, command: str) -> None:
    if fps is None:
        raise ValueError(
            f"{command} requires the run dir to contain input-fps/ files"
        )
