"""KNOSSOS chunked-dataset adapters (optional dependency:
``knossos_utils``).

Reference: elektronn3/data/knossos.py:13-167 (KnossosRawData: random
patch sampling with in_memory / caching / disk modes, free-RAM guard)
and elektronn3/data/knossos_labels.py:14-178 (KnossosLabels: paired
raw+label patches from .k.zip annotations, movement-area bounds,
per-patch voxel-count sampling weights).
"""

from __future__ import annotations

import os
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from elektronn3_tpu import floatX, logger
from elektronn3_tpu.data import transforms
from elektronn3_tpu.data.cnndata import Dataset

try:
    from knossos_utils import KnossosDataset
    _HAS_KNOSSOS = True
except ImportError:
    KnossosDataset = None
    _HAS_KNOSSOS = False


def _require_knossos():
    if not _HAS_KNOSSOS:
        raise ImportError(
            "knossos_utils is required for KNOSSOS dataset support "
            "(pip install knossos_utils).")


class KnossosRawData(Dataset):
    """Random raw patch sampling from a KNOSSOS dataset.

    Modes (reference knossos.py:70-89):
    - 'in_memory': load the full bounding box to RAM once.
    - 'caching': reuse-counted sample cache (each cached patch is served
      ``cache_reuses`` times before being replaced).
    - 'disk': read every patch from disk.
    """

    def __init__(self, conf_path: str, patch_shape: Sequence[int],
                 transform: Callable = transforms.Identity(),
                 bounds: Optional[Tuple[Sequence[int], Sequence[int]]] = None,
                 mag: int = 1, epoch_size: int = 100,
                 disable_memory_check: bool = False,
                 mode: str = "disk", cache_size: int = 50,
                 cache_reuses: int = 10, raw_dtype=np.uint8):
        _require_knossos()
        self.conf_path = os.path.expanduser(conf_path)
        self.patch_shape = np.array(patch_shape)  # zyx
        self.transform = transform
        self.mag = mag
        self.epoch_size = epoch_size
        self.mode = mode
        self.cache_size = cache_size
        self.cache_reuses = cache_reuses
        self._cache: List[np.ndarray] = []
        self._cache_uses: List[int] = []
        self.kd = KnossosDataset(self.conf_path, show_progress=False)
        if bounds is None:
            bounds = (np.zeros(3, np.int64),
                      np.array(self.kd.boundary) // mag)
        self.bounds = (np.array(bounds[0]), np.array(bounds[1]))
        self.shape = self.bounds[1] - self.bounds[0]
        if mode == "in_memory":
            if not disable_memory_check:
                self.memory_check()
            self._inmem = self.kd.load_raw(
                offset=tuple(self.bounds[0]), size=tuple(self.shape),
                mag=self.mag).astype(raw_dtype)
        else:
            self._inmem = None

    def memory_check(self):
        """Refuse to load datasets larger than free RAM (reference
        knossos.py:141-154)."""
        try:
            import psutil
            free = psutil.virtual_memory().available
        except ImportError:
            with open("/proc/meminfo") as f:
                kv = dict(line.split(":", 1) for line in f)
            free = int(kv["MemAvailable"].strip().split()[0]) * 1024
        need = int(np.prod(self.shape))
        if need > 0.9 * free:
            raise RuntimeError(
                f"Dataset ({need / 1e9:.1f} GB) exceeds available memory "
                f"({free / 1e9:.1f} GB). Use mode='caching' or 'disk'.")

    def _random_offset(self) -> np.ndarray:
        hi = self.shape - self.patch_shape
        return self.bounds[0] + np.array(
            [np.random.randint(0, max(h, 1)) for h in hi])

    def _load_patch(self) -> np.ndarray:
        off = self._random_offset()
        if self._inmem is not None:
            rel = off - self.bounds[0]
            sl = tuple(slice(r, r + p)
                       for r, p in zip(rel, self.patch_shape))
            return np.asarray(self._inmem[sl])
        return self.kd.load_raw(offset=tuple(off),
                                size=tuple(self.patch_shape),
                                mag=self.mag)

    def __getitem__(self, index: int):
        if self.mode == "caching":
            if len(self._cache) < self.cache_size:
                patch = self._load_patch()
                self._cache.append(patch)
                self._cache_uses.append(1)
            else:
                i = np.random.randint(0, len(self._cache))
                if self._cache_uses[i] >= self.cache_reuses:
                    self._cache[i] = self._load_patch()
                    self._cache_uses[i] = 0
                patch = self._cache[i]
                self._cache_uses[i] += 1
        else:
            patch = self._load_patch()
        inp = patch[None].astype(floatX)  # (C=1, D, H, W)
        inp, _ = self.transform(inp, None)
        return {"inp": np.ascontiguousarray(inp, floatX)}

    def __len__(self):
        return self.epoch_size


class KnossosLabels(Dataset):
    """Paired raw+label patch sampling from KNOSSOS + .k.zip annotation
    files. Reference knossos_labels.py:14-178."""

    def __init__(self, conf_path_label: str, conf_path_raw_data: str,
                 dir_path_label: str, patch_shape: Sequence[int],
                 transform: Callable = transforms.Identity(),
                 mag: int = 1, epoch_size: int = 100,
                 label_offset: int = 0, label_order: Optional[Sequence[int]]
                 = None, raw_mode: str = "disk"):
        _require_knossos()
        self.kd_label = KnossosDataset(os.path.expanduser(conf_path_label),
                                       show_progress=False)
        self.kd_raw = KnossosDataset(
            os.path.expanduser(conf_path_raw_data), show_progress=False)
        self.dir_path_label = os.path.expanduser(dir_path_label)
        self.patch_shape = np.array(patch_shape)
        self.transform = transform
        self.mag = mag
        self.epoch_size = epoch_size
        self.label_offset = label_offset
        self.label_order = label_order
        import glob
        self.kzip_paths = sorted(
            glob.glob(os.path.join(self.dir_path_label, "*.k.zip")))
        if not self.kzip_paths:
            raise FileNotFoundError(
                f"No .k.zip files found in {self.dir_path_label}")
        # Group annotation files by identical movement-area bounds: all
        # kzips covering the same region are label-SUMMED per patch and
        # contradicting voxels zeroed (reference
        # knossos_labels.py:93-133 file_bounds grouping + overlap
        # zeroing in _get_data).
        groups: dict = {}
        for p in self.kzip_paths:
            lo, hi = self._get_file_bounds(p)
            key = (tuple(lo), tuple(hi))
            groups.setdefault(key, []).append(p)
        self._bounds = [(np.array(lo), np.array(hi)) for lo, hi in groups]
        self._group_paths = list(groups.values())
        sizes = [float(np.prod(hi - lo)) for lo, hi in self._bounds]
        self._weights = np.array(sizes) / np.sum(sizes)

    def _get_file_bounds(self, kzip_path
                         ) -> Tuple[np.ndarray, np.ndarray]:
        """Movement-area bounds of one annotation file (reference
        knossos_labels.py:85-108)."""
        area_min, area_sz = self.kd_label.get_movement_area(kzip_path)
        lo = np.array(area_min) // self.mag
        hi = lo + np.array(area_sz) // self.mag
        return lo, hi

    def _get_data(self, kzip_paths, lo, size):
        """Load a raw patch + the merged labels of every kzip covering
        these bounds. Labels are summed; voxels labeled non-background
        by more than one annotation file contradict and are zeroed with
        a count warning (reference knossos_labels.py:110-133)."""
        label_sum = None
        nonbg_count = None
        for kzip_path in kzip_paths:
            label = np.asarray(self.kd_label.from_kzip_to_matrix(
                kzip_path, size=tuple(size), offset=tuple(lo),
                mag=self.mag, verbose=False, show_progress=False))
            if label_sum is None:
                label_sum = label.copy()
                nonbg_count = (label != 0).astype(np.int32)
            else:
                label_sum = label_sum + label
                nonbg_count += label != 0
        conflicts = nonbg_count > 1
        n_conflicts = int(conflicts.sum())
        if n_conflicts:
            logger.warning(
                f"Detected {n_conflicts} overlapping/contradicting label "
                f"voxels across {len(kzip_paths)} annotation files at "
                f"offset {tuple(lo)}; setting them to background.")
            label_sum[conflicts] = 0
        raw = self.kd_raw.load_raw(offset=tuple(lo), size=tuple(size),
                                   mag=self.mag)
        return raw, label_sum

    def __getitem__(self, index: int):
        fi = np.random.choice(len(self._group_paths), p=self._weights)
        lo, hi = self._bounds[fi]
        span = hi - lo - self.patch_shape
        off = lo + np.array([np.random.randint(0, max(s, 1))
                             for s in span])
        raw, label = self._get_data(self._group_paths[fi], off,
                                    self.patch_shape)
        label = np.asarray(label, np.int64) - self.label_offset
        if self.label_order is not None:
            remapped = np.zeros_like(label)
            for new, old in enumerate(self.label_order):
                remapped[label == old] = new
            label = remapped
        inp = np.asarray(raw, floatX)[None]
        inp, label = self.transform(inp, label)
        return {"inp": np.ascontiguousarray(inp, floatX),
                "target": np.ascontiguousarray(label)}

    def __len__(self):
        return self.epoch_size
