import numpy as np
import pytest

from bblean_tpu.fingerprints import (
    _get_fingerprints_from_file_seq,
    make_fake_fingerprints,
    pack_fingerprints,
    unpack_fingerprints,
)

# Golden fixture: synthetic fingerprints must be bit-identical to the
# reference generator for the same seed (anchors every clustering fixture)
GOLDEN_FAKE_32 = [
    [218, 42, 91, 221],
    [35, 145, 135, 102],
    [196, 207, 128, 64],
    [255, 253, 247, 191],
    [190, 49, 190, 234],
    [9, 144, 2, 193],
    [22, 1, 90, 5],
    [103, 34, 121, 0],
    [159, 63, 250, 157],
    [0, 32, 70, 36],
    [204, 250, 67, 139],
    [125, 100, 248, 199],
    [34, 2, 65, 9],
    [0, 128, 0, 0],
    [30, 114, 56, 160],
    [18, 144, 0, 32],
    [133, 132, 60, 30],
    [88, 48, 104, 57],
    [138, 41, 206, 55],
    [0, 66, 8, 2],
]


def test_make_fake_fingerprints_golden() -> None:
    fps = make_fake_fingerprints(20, n_features=32, seed=12620509540149709235)
    assert fps.tolist() == GOLDEN_FAKE_32


def test_make_fake_fingerprints_props() -> None:
    fps = make_fake_fingerprints(50, n_features=2048, seed=3, pack=False)
    assert fps.shape == (50, 2048)
    assert set(np.unique(fps)) <= {0, 1}
    pops = fps.sum(1)
    assert (pops > 0).all() and (pops < 2048).all()


def test_pack_unpack_roundtrip() -> None:
    fps = make_fake_fingerprints(10, n_features=2048, seed=1, pack=False)
    packed = pack_fingerprints(fps)
    assert packed.shape == (10, 256)
    assert (unpack_fingerprints(packed) == fps).all()


def test_unpack_trims_padding() -> None:
    bits = np.ones((2, 12), dtype=np.uint8)
    packed = pack_fingerprints(bits)
    assert packed.shape == (2, 2)
    assert unpack_fingerprints(packed, 12).shape == (2, 12)
    assert unpack_fingerprints(packed).shape == (2, 16)


def test_file_seq_gather(tmp_path) -> None:
    a = make_fake_fingerprints(7, seed=1)
    b = make_fake_fingerprints(5, seed=2)
    c = make_fake_fingerprints(3, seed=3)
    files = []
    for i, arr in enumerate((a, b, c)):
        p = tmp_path / f"f{i}.npy"
        np.save(p, arr)
        files.append(p)
    full = np.concatenate([a, b, c])
    idxs = [0, 3, 6, 7, 11, 12, 14]
    out = _get_fingerprints_from_file_seq(files, idxs)
    assert (out == full[idxs]).all()

    # Unsorted raises
    with pytest.raises(ValueError):
        _get_fingerprints_from_file_seq(files, [3, 0])
    # Out of range raises
    with pytest.raises(ValueError):
        _get_fingerprints_from_file_seq(files, [99])


def test_fake_fps_requires_multiple_of_8() -> None:
    with pytest.raises(ValueError):
        make_fake_fingerprints(2, n_features=13)
