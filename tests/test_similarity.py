r"""Kernel conformance tests (host NumPy backend + native backend if built).

Golden values match the reference implementation's similarity test fixtures.
"""

import numpy as np
import pytest

import bblean_tpu._np_similarity as npsim
import bblean_tpu.similarity as gensim
from bblean_tpu.fingerprints import make_fake_fingerprints

try:
    from bblean_tpu import _native

    NATIVE_AVAIL = _native.available()
except ImportError:
    NATIVE_AVAIL = False

BACKENDS = [npsim]
if NATIVE_AVAIL:
    BACKENDS.append(_native)

SEED = 17408390758220920002


def test_popcount() -> None:
    fps = make_fake_fingerprints(10, seed=SEED)
    expect = [1137, 124, 558, 1159, 281, 323, 1264, 1252, 879, 631]
    assert npsim.popcount(fps).tolist() == expect
    assert npsim.popcount(fps[0]) == 1137


@pytest.mark.parametrize("backend", BACKENDS)
def test_jt_sim_arr_vec_packed(backend) -> None:
    fps = make_fake_fingerprints(10, seed=SEED)
    expect = np.array(
        [
            1.0,
            0.050833333333333,
            0.234522942461763,
            0.400854179377669,
            0.128980891719745,
            0.130030959752322,
            0.411522633744856,
            0.411104548139398,
            0.309090909090909,
            0.246826516220028,
        ]
    )
    out = backend._jt_sim_arr_vec_packed(fps, fps[0])
    assert np.isclose(out, expect).all()


def test_jt_sim_packed_shapes() -> None:
    fps = make_fake_fingerprints(10, seed=SEED)
    arr_vec = gensim.jt_sim_packed(fps, fps[0])
    vec_arr = gensim.jt_sim_packed(fps[0], fps)
    assert np.isclose(arr_vec, vec_arr).all()
    assert gensim.jt_sim_packed(fps[0], fps[0]) == 1.0
    with pytest.raises(ValueError):
        gensim.jt_sim_packed(fps[0].reshape(1, 1, -1), fps)


@pytest.mark.parametrize("backend", BACKENDS)
def test_jt_isim_from_sum(backend) -> None:
    fps = make_fake_fingerprints(100, seed=SEED, pack=False)
    s = backend.jt_isim_from_sum(fps.sum(0, dtype=np.uint64), len(fps))
    assert s == 0.21824334501491158


@pytest.mark.parametrize("backend", BACKENDS)
def test_jt_isim_packed_unpacked(backend) -> None:
    unpacked = make_fake_fingerprints(100, seed=SEED, pack=False)
    packed = make_fake_fingerprints(100, seed=SEED, pack=True)
    assert backend.jt_isim_unpacked(unpacked) == 0.21824334501491158
    assert backend.jt_isim_packed(packed) == 0.21824334501491158


@pytest.mark.parametrize("backend", BACKENDS)
def test_jt_isim_edge_cases(backend) -> None:
    # Disjoint fingerprints: isim == 0
    fps = make_fake_fingerprints(1, seed=SEED, pack=False)
    disjoint = (~fps.astype(np.bool_)).view(np.uint8)
    both = np.concatenate((fps, disjoint))
    assert backend.jt_isim_from_sum(both.sum(0, dtype=np.uint64), 2) == 0

    eye = np.eye(2048, 2048, dtype=np.uint8)
    assert backend.jt_isim_from_sum(eye.sum(0, dtype=np.uint64), 2048) == 0

    # Homogeneous sets: isim == 1
    zeros = np.zeros((100, 2048), dtype=np.uint8)
    assert backend.jt_isim_from_sum(zeros.sum(0, dtype=np.uint64), 100) == 1.0
    ones = np.ones((100, 2048), dtype=np.uint8)
    assert backend.jt_isim_from_sum(ones.sum(0, dtype=np.uint64), 100) == 1.0

    # Fewer than 2 objects: warning + NaN
    with pytest.warns(RuntimeWarning):
        out = backend.jt_isim_from_sum(fps.sum(0, dtype=np.uint64), 1)
    assert np.isnan(out)


@pytest.mark.parametrize("backend", BACKENDS)
def test_jt_most_dissimilar_packed(backend) -> None:
    fps = make_fake_fingerprints(10, seed=SEED)
    expect_sims1 = np.array(
        [
            0.05083333, 1.0, 0.03805175, 0.05077805, 0.04651163,
            0.04683841, 0.05954198, 0.06254826, 0.05578947, 0.05006954,
        ]
    )
    expect_sims2 = np.array(
        [
            0.23452294, 0.03805175, 1.0, 0.2352518, 0.08961039,
            0.1166033, 0.22281879, 0.2363388, 0.2045264, 0.17490119,
        ]
    )
    idx1, idx2, sims1, sims2 = backend.jt_most_dissimilar_packed(fps)
    assert idx1 == 1
    assert idx2 == 2
    assert np.isclose(sims1, expect_sims1).all()
    assert np.isclose(sims2, expect_sims2).all()


def test_zero_fp_similarity_clamp() -> None:
    # The union clamp avoids a 0/0 NaN for all-zero fp pairs (the resulting
    # 0.0 matches reference arithmetic: intersection / max(union, 1))
    zeros = np.zeros((3, 256), dtype=np.uint8)
    out = npsim._jt_sim_arr_vec_packed(zeros, zeros[0])
    assert not np.isnan(out).any()
    assert (out == 0.0).all()


def test_centroid_from_sum() -> None:
    fps = make_fake_fingerprints(10, seed=SEED, pack=False)
    ls = fps.sum(0, dtype=np.uint64)
    cent = npsim.centroid_from_sum(ls, 10, pack=False)
    assert (cent == (ls >= 5)).all()
    # Single sample: the centroid is the sample itself
    single = npsim.centroid_from_sum(fps[0].astype(np.uint64), 1, pack=False)
    assert (single == fps[0]).all()
    # Packed output round-trips
    packed = npsim.centroid_from_sum(ls, 10, pack=True)
    assert (np.unpackbits(packed) == cent).all()


def test_jt_compl_isim_golden() -> None:
    fps = make_fake_fingerprints(10, seed=SEED, pack=False)
    expect = [
        0.20256457907452147,
        0.24748926949201983,
        0.22550084742079876,
        0.2002884861456855,
        0.23889840001690868,
        0.2364222674813306,
        0.1986207548061027,
        0.19904732709222533,
        0.21303348506016495,
        0.2225069540267648,
    ]
    assert npsim.jt_compl_isim(fps, input_is_packed=False).tolist() == expect
    assert (
        npsim.jt_compl_isim(np.zeros((10, 512), dtype=np.uint8))
        == np.ones(10, dtype=np.float64)
    ).all()
    with pytest.warns(RuntimeWarning):
        npsim.jt_compl_isim(fps[:2], input_is_packed=False)


def test_jt_isim_medoid_golden() -> None:
    fps = make_fake_fingerprints(30, n_features=8, seed=SEED, pack=False)
    idx, m = npsim.jt_isim_medoid(fps)
    assert idx == 26
    assert m.tolist() == [1, 1, 0, 1, 1, 1, 1, 1]
    with pytest.raises(ValueError):
        npsim.jt_isim_medoid(np.empty(0, dtype=np.uint8))


def test_radius_compl_and_diameter() -> None:
    fps = make_fake_fingerprints(20, seed=SEED, pack=False)
    ls = fps.sum(0, dtype=np.uint64)
    rc = gensim.jt_isim_radius_compl_from_sum(ls, 20)
    assert 0.0 < rc < 1.0
    assert gensim.jt_isim_radius_from_sum(ls, 20) == 1 - rc
    d = gensim.jt_isim_diameter_from_sum(ls, 20)
    assert d == 1 - gensim.jt_isim_from_sum(ls, 20)
    assert gensim.jt_isim_diameter(fps, input_is_packed=False) == d
    assert gensim.jt_isim_radius(fps, input_is_packed=False) == 1 - rc
    assert gensim.jt_isim_radius_compl(fps, input_is_packed=False) == rc


def test_sim_matrix_and_sampling() -> None:
    fps = make_fake_fingerprints(12, seed=SEED)
    m = gensim.jt_sim_matrix_packed(fps)
    assert m.shape == (12, 12)
    assert (np.diag(m) == 1.0).all()
    assert (m == m.T).all()

    idxs = gensim.jt_stratified_sampling(fps, 4)
    assert len(idxs) == 4
    assert len(set(idxs.tolist())) == 4
    assert gensim.jt_stratified_sampling(fps, 0).size == 0
    with pytest.raises(ValueError):
        gensim.jt_stratified_sampling(fps, 13)

    std = gensim.estimate_jt_std(fps, n_samples=6)
    assert 0.0 <= std <= 1.0
