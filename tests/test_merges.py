r"""Merge-criteria decision tests against independently-written oracles."""

import numpy as np
import pytest

from bblean_tpu._merges import BUILTIN_MERGES, get_merge_accept_fn
from bblean_tpu.fingerprints import make_fake_fingerprints
from bblean_tpu.similarity import jt_isim_from_sum, jt_isim_radius_compl_from_sum


def _case_grid():
    r"""(old_ls, old_n, nom_ls, nom_n) cases spanning 1 and >1 sized CFs."""
    fps = make_fake_fingerprints(40, n_features=256, seed=7, pack=False).astype(
        np.int64
    )
    cases = []
    for old_count in (1, 2, 9):
        for nom_count in (1, 2, 5):
            old = fps[:old_count]
            nom = fps[old_count : old_count + nom_count]
            cases.append(
                (old.sum(0), old_count, nom.sum(0), nom_count)
            )
    return cases


@pytest.mark.parametrize("threshold", [0.0, 0.2, 0.5, 0.65, 1.0])
@pytest.mark.parametrize("case", _case_grid())
def test_diameter_and_radius(threshold, case) -> None:
    old_ls, old_n, nom_ls, nom_n = case
    new_ls = old_ls + nom_ls
    new_n = old_n + nom_n
    dia = get_merge_accept_fn("diameter")
    rad = get_merge_accept_fn("radius")
    args = (threshold, new_ls, new_n, old_ls, nom_ls, old_n, nom_n)
    assert dia(*args) == (jt_isim_from_sum(new_ls, new_n) >= threshold)
    assert rad(*args) == (
        jt_isim_radius_compl_from_sum(new_ls, new_n) >= threshold
    )


@pytest.mark.parametrize("tolerance", [0.0, 0.05, 0.2])
@pytest.mark.parametrize("threshold", [0.0, 0.2, 0.65])
@pytest.mark.parametrize("case", _case_grid())
def test_tolerance_diameter(tolerance, threshold, case) -> None:
    old_ls, old_n, nom_ls, nom_n = case
    new_ls = old_ls + nom_ls
    new_n = old_n + nom_n
    fn = get_merge_accept_fn("tolerance-diameter", tolerance)
    got = fn(threshold, new_ls, new_n, old_ls, nom_ls, old_n, nom_n)

    # Oracle: diameter screen, then adaptive-tolerance cohesion regression
    new_c = jt_isim_from_sum(new_ls, new_n)
    if new_c < threshold:
        expect = False
    elif old_n == 1:
        expect = True
    else:
        old_c = jt_isim_from_sum(old_ls, old_n)
        tol = max(tolerance * (np.exp(-1e-3 * old_n) - np.exp(-1e-3 * 1000)), 0.0)
        expect = new_c >= old_c - tol
    assert got == expect


@pytest.mark.parametrize("tolerance", [0.0, 0.05, 0.2])
@pytest.mark.parametrize("threshold", [0.0, 0.2, 0.65])
@pytest.mark.parametrize("case", _case_grid())
def test_tolerance_radius(tolerance, threshold, case) -> None:
    old_ls, old_n, nom_ls, nom_n = case
    new_ls = old_ls + nom_ls
    new_n = old_n + nom_n
    fn = get_merge_accept_fn("tolerance-radius", tolerance)
    got = fn(threshold, new_ls, new_n, old_ls, nom_ls, old_n, nom_n)

    new_c = jt_isim_radius_compl_from_sum(new_ls, new_n)
    if new_c < threshold:
        expect = False
    elif old_n == 1:
        expect = True
    else:
        old_c = jt_isim_radius_compl_from_sum(old_ls, old_n)
        tol = max(tolerance * (np.exp(-1e-3 * old_n) - np.exp(-1e-3 * 1000)), 0.0)
        expect = new_c >= old_c - tol
    assert got == expect


@pytest.mark.parametrize("tolerance", [0.0, 0.05, 0.2])
@pytest.mark.parametrize("threshold", [0.0, 0.2, 0.65])
@pytest.mark.parametrize("case", _case_grid())
def test_tolerance_legacy(tolerance, threshold, case) -> None:
    old_ls, old_n, nom_ls, nom_n = case
    new_ls = old_ls + nom_ls
    new_n = old_n + nom_n
    fn = get_merge_accept_fn("tolerance-legacy", tolerance)
    got = fn(threshold, new_ls, new_n, old_ls, nom_ls, old_n, nom_n)

    new_dc = jt_isim_from_sum(new_ls, new_n)
    if new_dc < threshold:
        expect = False
    elif old_n == 1 or nom_n != 1:
        expect = True
    else:
        old_dc = jt_isim_from_sum(old_ls, old_n)
        expect = (new_dc * new_n - old_dc * (old_n - 1)) / 2 >= old_dc - tolerance
    assert got == expect


def test_never_merge() -> None:
    fn = get_merge_accept_fn("never-merge")
    ls = np.ones(64, dtype=np.int64)
    assert not fn(0.0, ls * 2, 2, ls, ls, 1, 1)


def test_nonadaptive_tolerance() -> None:
    from bblean_tpu._merges import ToleranceDiameterMerge

    fn = ToleranceDiameterMerge(tolerance=0.05, adaptive=False)
    assert fn.decay == 0.0
    assert fn.offset == 0.0


def test_factory() -> None:
    for name in BUILTIN_MERGES:
        fn = get_merge_accept_fn(name)
        assert fn.name == name
    with pytest.raises(ValueError):
        get_merge_accept_fn("bogus")
