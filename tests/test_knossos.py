"""KNOSSOS adapter tests with a stubbed KnossosDataset (VERDICT r1 #10).

knossos_utils is not installed here; these tests monkeypatch a fake
KnossosDataset into elektronn3_tpu.data.knossos to exercise the
nontrivial logic: the three I/O modes (in_memory / caching / disk),
cache reuse counting, the RAM guard, movement-area bounds,
voxel-count sampling weights, label offset/reorder, and the .k.zip
preview export handler.
"""

import numpy as np
import pytest

import elektronn3_tpu.data.knossos as kn


class FakeKD:
    """Deterministic stand-in for knossos_utils.KnossosDataset."""
    boundary = (32, 24, 16)  # xyz-ish; adapter treats as zyx extent
    load_calls = 0

    def __init__(self, path, show_progress=False):
        self.path = path
        rng = np.random.default_rng(0)
        self.vol = rng.integers(0, 255, size=(64, 64, 64)).astype(np.uint8)

    def load_raw(self, offset, size, mag=1):
        FakeKD.load_calls += 1
        sl = tuple(slice(o, o + s) for o, s in zip(offset, size))
        return self.vol[sl]

    def get_movement_area(self, kzip_path):
        if "a.k.zip" in kzip_path:
            return (0, 0, 0), (16, 16, 16)       # 4096 voxels
        return (8, 8, 8), (8, 8, 8)              # 512 voxels

    def from_kzip_to_matrix(self, kzip_path, size, offset, mag=1,
                            verbose=False, show_progress=False):
        sl = tuple(slice(o, o + s) for o, s in zip(offset, size))
        return (self.vol[sl] > 128).astype(np.int64) + 1  # labels {1, 2}

    def save_to_kzip(self, **kw):
        FakeKD.saved = kw


@pytest.fixture
def fake_knossos(monkeypatch):
    monkeypatch.setattr(kn, "KnossosDataset", FakeKD)
    monkeypatch.setattr(kn, "_HAS_KNOSSOS", True)
    FakeKD.load_calls = 0
    return FakeKD


def test_raw_disk_mode(fake_knossos):
    ds = kn.KnossosRawData("conf", patch_shape=(4, 6, 8), mode="disk",
                           bounds=((0, 0, 0), (16, 16, 16)), epoch_size=5)
    np.random.seed(0)
    s = ds[0]
    assert s["inp"].shape == (1, 4, 6, 8)
    assert len(ds) == 5
    n0 = fake_knossos.load_calls
    ds[1]
    assert fake_knossos.load_calls == n0 + 1  # every access hits disk


def test_raw_in_memory_mode(fake_knossos):
    ds = kn.KnossosRawData("conf", patch_shape=(4, 4, 4), mode="in_memory",
                           bounds=((0, 0, 0), (16, 16, 16)))
    n0 = fake_knossos.load_calls
    np.random.seed(0)
    for i in range(4):
        ds[i]
    assert fake_knossos.load_calls == n0  # served from RAM


def test_raw_in_memory_guard(fake_knossos, monkeypatch):
    huge = ((0, 0, 0), (100000, 100000, 100000))
    with pytest.raises(RuntimeError, match="exceeds available memory"):
        kn.KnossosRawData("conf", patch_shape=(4, 4, 4), mode="in_memory",
                          bounds=huge)
    # disable_memory_check must bypass the guard (but then load_raw
    # would be called with the huge size; use a small bounds instead)
    kn.KnossosRawData("conf", patch_shape=(4, 4, 4), mode="in_memory",
                      bounds=((0, 0, 0), (8, 8, 8)),
                      disable_memory_check=True)


def test_raw_caching_reuse_counts(fake_knossos):
    ds = kn.KnossosRawData("conf", patch_shape=(4, 4, 4), mode="caching",
                           bounds=((0, 0, 0), (16, 16, 16)),
                           cache_size=2, cache_reuses=3, epoch_size=100)
    np.random.seed(0)
    ds[0], ds[1]
    assert fake_knossos.load_calls == 2          # cache fill
    for i in range(2 * 3):                       # within reuse budget
        ds[i]
    assert fake_knossos.load_calls <= 2 + 2      # at most refreshed once
    fills = fake_knossos.load_calls
    for i in range(40):
        ds[i]
    assert fake_knossos.load_calls > fills       # exhausted reuses refresh


def test_labels_bounds_weights_and_reorder(fake_knossos, tmp_path):
    (tmp_path / "a.k.zip").touch()
    (tmp_path / "b.k.zip").touch()
    ds = kn.KnossosLabels(
        "conf_l", "conf_r", str(tmp_path), patch_shape=(4, 4, 4),
        label_offset=1, label_order=(1, 0), epoch_size=7)
    # movement-area derived bounds
    assert np.array_equal(ds._bounds[0][0], (0, 0, 0))
    assert np.array_equal(ds._bounds[0][1], (16, 16, 16))
    assert np.array_equal(ds._bounds[1][0], (8, 8, 8))
    # voxel-count sampling weights: 4096 vs 512
    assert np.allclose(ds._weights, [4096 / 4608, 512 / 4608])
    np.random.seed(0)
    s = ds[0]
    assert s["inp"].shape == (1, 4, 4, 4)
    assert s["target"].shape == (4, 4, 4)
    # raw labels {1,2} - offset 1 -> {0,1} -> reorder (1,0) -> swapped
    assert set(np.unique(s["target"])).issubset({0, 1})
    assert len(ds) == 7


def test_labels_multi_kzip_merge_and_conflict_zeroing(fake_knossos,
                                                      tmp_path,
                                                      monkeypatch):
    """Two kzips with IDENTICAL bounds are grouped; their labels sum,
    and voxels annotated non-background in both are zeroed (reference
    knossos_labels.py:110-133)."""
    (tmp_path / "c.k.zip").touch()
    (tmp_path / "d.k.zip").touch()

    class KD2(fake_knossos):
        def get_movement_area(self, kzip_path):
            return (0, 0, 0), (16, 16, 16)  # same bounds for both files

        def from_kzip_to_matrix(self, kzip_path, size, offset, mag=1,
                                verbose=False, show_progress=False):
            m = np.zeros(size, np.int64)
            if "c.k.zip" in kzip_path:
                m[0] = 1          # plane 0: only c -> survives as 1
                m[1] = 2          # plane 1: c=2, d=3 -> conflict -> 0
            else:
                m[1] = 3
                m[2] = 4          # plane 2: only d -> survives as 4
            return m

    monkeypatch.setattr(kn, "KnossosDataset", KD2)
    ds = kn.KnossosLabels(
        "conf_l", "conf_r", str(tmp_path), patch_shape=(4, 4, 4),
        epoch_size=3)
    assert len(ds._group_paths) == 1          # grouped by bounds
    assert len(ds._group_paths[0]) == 2
    raw, label = ds._get_data(ds._group_paths[0], (0, 0, 0), (4, 4, 4))
    assert np.all(label[0] == 1)              # exclusive c annotation
    assert np.all(label[1] == 0)              # contradiction zeroed
    assert np.all(label[2] == 4)              # exclusive d annotation
    np.random.seed(0)
    s = ds[0]
    assert s["target"].shape == (4, 4, 4)


def test_labels_requires_kzips(fake_knossos, tmp_path):
    with pytest.raises(FileNotFoundError):
        kn.KnossosLabels("c", "c", str(tmp_path), patch_shape=(4, 4, 4))


def test_write_to_kzip_handler(fake_knossos, monkeypatch, tmp_path):
    import elektronn3_tpu.training.handlers as H

    monkeypatch.setitem(
        __import__("sys").modules, "knossos_utils",
        type("M", (), {"KnossosDataset": FakeKD}))

    class T:
        knossos_preview_config = {
            "dataset": "conf", "offset": (1, 2, 3), "size": (8, 8, 8)}
        save_path = str(tmp_path)
        step = 42

    pred = np.zeros((1, 4, 6, 8), np.int64)
    H.write_to_kzip(T(), pred)
    assert FakeKD.saved["offset"] == (1, 2, 3)
    assert FakeKD.saved["data"].shape == (8, 6, 4)  # zyx -> xyz swap
    assert "preview_42.k.zip" in FakeKD.saved["kzip_path"]
    assert "MovementArea" in FakeKD.saved["annotation_str"]
