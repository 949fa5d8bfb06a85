r"""Dual-backend tests: the native (C++) engine must match the Python exact
engine bit-for-bit (the reference's dual-backend strategy, applied to whole
clusterings instead of single kernels)."""

import os

import numpy as np
import pytest

from bblean_tpu.fingerprints import make_fake_fingerprints

try:
    from bblean_tpu.engine.native import native_engine_available

    NATIVE = native_engine_available()
except Exception:
    NATIVE = False

pytestmark = pytest.mark.skipif(not NATIVE, reason="native library not built")

SEED = 12620509540149709235


def _fit_both(fps, **kwargs):
    r"""Fit with the native engine and the Python engine; return both trees."""
    import bblean_tpu.tree as tree_mod

    native = tree_mod.BitBirch(**kwargs).fit(fps)
    assert type(native._engine).__name__ == "NativeExactTree"
    os.environ["BBLEAN_TPU_NO_EXTENSIONS"] = "1"
    try:
        python = tree_mod.BitBirch(**kwargs).fit(fps)
        assert type(python._engine).__name__ == "ExactTree"
    finally:
        del os.environ["BBLEAN_TPU_NO_EXTENSIONS"]
    return native, python


@pytest.mark.parametrize(
    "criterion,threshold",
    [
        ("diameter", 0.65),
        ("diameter", 0.3),
        ("radius", 0.65),
        ("tolerance-diameter", 0.3),
        ("tolerance-radius", 0.3),
        ("tolerance-legacy", 0.65),
    ],
)
def test_native_matches_python(criterion, threshold) -> None:
    fps = make_fake_fingerprints(400, seed=SEED)
    native, python = _fit_both(
        fps, threshold=threshold, merge_criterion=criterion, tolerance=0.05
    )
    assert native.get_cluster_mol_ids() == python.get_cluster_mol_ids()


def test_native_buffer_dtype_names() -> None:
    r"""dtype-class grouping (used by the multiround file exchange) matches."""
    fps = make_fake_fingerprints(300, seed=SEED)
    native, python = _fit_both(fps, threshold=0.3)
    nf, nm = native._bf_to_np()
    pf, pm = python._bf_to_np()
    assert list(nf.keys()) == list(pf.keys())
    for key in nf:
        assert nm[key] == pm[key]
        assert all((a == b).all() for a, b in zip(nf[key], pf[key]))


def test_native_refine_matches_python() -> None:
    fps = make_fake_fingerprints(200, seed=SEED)
    native, python = _fit_both(fps, threshold=0.3)
    native.refine_inplace(fps)
    python.refine_inplace(fps)
    assert native.get_cluster_mol_ids() == python.get_cluster_mol_ids()


def test_native_save_load(tmp_path) -> None:
    from bblean_tpu import BitBirch

    fps = make_fake_fingerprints(300, seed=SEED)
    tree = BitBirch(threshold=0.3).fit(fps)
    path = tmp_path / "native-tree.pkl"
    tree.save(path)
    loaded = BitBirch.load(path)
    assert loaded.get_cluster_mol_ids() == tree.get_cluster_mol_ids()
    # The restored native tree continues fitting identically to the original
    more = make_fake_fingerprints(100, seed=4)
    tree.fit(more)
    loaded.fit(more)
    assert loaded.get_cluster_mol_ids() == tree.get_cluster_mol_ids()


def test_native_custom_merge_fn_falls_back() -> None:
    r"""Custom merge callables cannot run natively; the Python engine runs."""
    from bblean_tpu._merges import DiameterMerge
    from bblean_tpu.tree import BitBirch

    class Custom(DiameterMerge):
        name = "my-custom"

    tree = BitBirch(merge_criterion=Custom(), threshold=0.3)
    tree.fit(make_fake_fingerprints(50, seed=1))
    assert type(tree._engine).__name__ == "ExactTree"


def test_native_speed_beats_reference_budget() -> None:
    r"""Throughput guard: the native engine must stay well above the
    reference's CI budget for the same workload (10k fps in < 0.9 s)."""
    import time

    from bblean_tpu import BitBirch

    fps = make_fake_fingerprints(10_000, seed=SEED)
    t0 = time.process_time()
    BitBirch(threshold=0.65).fit(fps)
    elapsed = time.process_time() - t0
    # Keep slack for slow CI hosts; locally this runs ~10x under the cap
    assert elapsed < 3.0
