"""Fully on-device warp-augmentation pipeline.

The BASELINE.json north star: "elektronn3.data's HDF5 patch sampling
plus elastic warping, rotation, and grey-value augmentations fuse into a
single on-device XLA/Pallas preprocessing pipeline feeding HBM with no
host round-trips".

Division of labor (SURVEY.md §7 hard parts):
- HOST (cheap, control-flow heavy): random cube choice, random 4x4
  matrix, corner-based OOB pre-check with retry, HDF5 window read. The
  window is padded to ONE static shape so the device program never
  recompiles.
- DEVICE (bandwidth/compute heavy): per-voxel inverse transform +
  trilinear/nearest interpolation for the whole batch in one vmapped
  program (`ops.warp.warp_interpolate_batch`) + photometric
  augmentations — all fusable with the subsequent train step.

Compared to the host pipeline (`DataLoader` over `PatchCreator`), this
moves the O(batch x patch-voxels) interpolation off the host CPU; the
host only streams raw windows.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from elektronn3_tpu import floatX, logger
from elektronn3_tpu.data import coord_transforms as ct
from elektronn3_tpu.data.sources import DataSource, slice_3d
from elektronn3_tpu.ops import warp as warp_ops


class DeviceWarpPatchLoader:
    """Batched patch loader with on-device warp interpolation.

    Args:
        inputs / targets: lists of DataSources ((C?,) D, H, W).
        patch_shape: (D, H, W) output patch shape.
        batch_size: patches per batch.
        window_shape: static host-read window shape; must be large
            enough for the warped bounding boxes (samples whose bounding
            box exceeds it are retried like OOB). Defaults to
            ``ceil(1.5 * patch_shape) + 8``.
        warp_prob / warp_kwargs / aniso_factor: as in PatchCreator.
        cube_prios: relative sampling priority per input cube
            (normalized internally; default uniform) — PatchCreator's
            cube_prios semantics (reference cnndata.py:363-397).
        epoch_size: batches per epoch.
        augment_fn: optional device-side augmentation
            ``fn(inp (N, pd, ph, pw, C), rng) -> inp`` applied after
            interpolation (see ops.warp photometric helpers).
        normalize: optional (mean, std) applied on device.
        seed: RNG seed.
    """

    def __init__(
            self,
            inputs: Sequence[DataSource],
            targets: Optional[Sequence[DataSource]],
            patch_shape: Tuple[int, int, int],
            batch_size: int = 8,
            window_shape: Optional[Tuple[int, int, int]] = None,
            warp_prob: float = 0.2,
            warp_kwargs: Optional[Dict] = None,
            aniso_factor: int = 2,
            cube_prios: Optional[Sequence[float]] = None,
            epoch_size: int = 100,
            augment_fn: Optional[Callable] = None,
            normalize: Optional[Tuple[float, float]] = None,
            seed: int = 0,
    ):
        self.inputs = list(inputs)
        self.targets = None if targets is None else list(targets)
        self.patch_shape = tuple(patch_shape)
        self.batch_size = batch_size
        if window_shape is None:
            window_shape = tuple(
                int(np.ceil(1.5 * s)) + 8 for s in patch_shape)
        self.window_shape = tuple(window_shape)
        self.warp_prob = warp_prob
        self.warp_kwargs = dict(warp_kwargs or {})
        self.aniso_factor = aniso_factor
        if cube_prios is None:
            self._prios = np.full(len(self.inputs), 1 / len(self.inputs))
        else:
            p_arr = np.asarray(cube_prios, np.float64)
            assert len(p_arr) == len(self.inputs)
            self._prios = p_arr / p_arr.sum()
        self.epoch_size = epoch_size
        self.augment_fn = augment_fn
        self.normalize = normalize
        self.rng = np.random.default_rng(seed)
        self._jax_key = jax.random.PRNGKey(seed)
        self.n_failed = 0
        self.n_ok = 0
        # Label windows dominate H2D bytes once the raw ships uint8
        # (int16 labels = 2x the uint8 raw at equal window size).
        # Segmentation labels almost always fit uint8 (<256 classes,
        # non-negative); probe each target source ONCE at init and ship
        # uint8 windows when every source fits — the device-side
        # astype(float32) is identical, so numerics are unchanged.
        self._targets_u8 = self.targets is not None and all(
            self._fits_uint8(t) for t in self.targets)

    @staticmethod
    def _fits_uint8(src) -> bool:
        if np.issubdtype(np.dtype(src.dtype), np.unsignedinteger) \
                and np.dtype(src.dtype).itemsize == 1:
            return True
        if not np.issubdtype(np.dtype(src.dtype), np.integer):
            return False
        arr = getattr(src, "_data", None)
        if arr is None or not isinstance(arr, np.ndarray) \
                or isinstance(arr, np.memmap):
            # Not (fully) in memory — np.memmap IS an ndarray subclass,
            # but min()/max() would fault in the whole cube at init.
            return False
        return bool(arr.min() >= 0 and arr.max() <= 255)

    def __len__(self):
        return self.epoch_size

    # -- host side -----------------------------------------------------

    def _sample_one(self):
        """Pick cube + matrix; corner-check; read a static window.

        Returns (window, t_window, M_inv, lo) with window shapes fixed
        to ``self.window_shape``.
        """
        ws = np.array(self.window_shape)
        while True:
            i = self.rng.choice(len(self.inputs), p=self._prios)
            src = self.inputs[i]
            tsrc = None if self.targets is None else self.targets[i]
            wk = dict(self.warp_kwargs)
            if not (self.warp_prob and self.rng.random() < self.warp_prob):
                wk["warp_amount"] = 0
            try:
                M = ct.get_warped_coord_transform(
                    inp_src_shape=src.shape,
                    patch_shape=self.patch_shape,
                    aniso_factor=self.aniso_factor,
                    rng=self.rng, **wk)
            except RuntimeError:
                raise
            M_inv = np.linalg.inv(M.astype(np.float64)).astype(np.float32)
            corners = ct.make_dest_corners(self.patch_shape)
            src_corners = (M_inv @ corners.T).T[:, :3]
            lo = np.floor(src_corners.min(0)).astype(np.int64)
            hi = np.ceil(src_corners.max(0) + 1).astype(np.int64) + 1
            shape3 = np.array(src.shape[-3:])
            if np.any(lo < 0) or np.any(hi > shape3) \
                    or np.any(hi - lo > ws):
                self.n_failed += 1
                continue
            self.n_ok += 1
            # Read and pad to the static window shape in the source's
            # NATIVE dtype: uint8 EM raw ships over H2D at 1 byte/voxel
            # (4x less than the old float32 path on the measured e2e
            # bottleneck); the cast + normalize happen on device
            # (_device_process). float sources pass through unchanged.
            cut = slice_3d(src, lo, hi, dtype=None)
            if cut.ndim == 3:
                cut = cut[None]  # (C=1, d, h, w)
            pad = [(0, 0)] + [(0, int(w - s))
                              for w, s in zip(ws, cut.shape[1:])]
            window = np.pad(cut, pad)  # (C, *window_shape)
            t_window = None
            if tsrc is not None:
                tcut = slice_3d(tsrc, lo, hi, dtype=None)
                if tcut.ndim == 3:
                    tcut = tcut[None]
                tpad = [(0, 0)] + pad[1:]
                t_window = np.pad(tcut, tpad)
                if self._targets_u8:
                    # exact for label values in [0, 255] (probed at
                    # init); halves the label H2D bytes vs int16
                    t_window = t_window.astype(np.uint8)
            return window, t_window, M_inv, lo.astype(np.float32)

    # -- device side ---------------------------------------------------

    @partial(jax.jit, static_argnames=("self",))
    def _device_process(self, windows, t_windows, M_invs, los, key):
        # windows (N, C, *window): arrive in the source's native dtype
        # (uint8 for EM raw — the H2D transfer ships 1 byte/voxel);
        # upcast to float32 HERE, on device, where the cast is free
        # (fused into the interpolation gather). Exact: uint8 -> f32 is
        # lossless, so numerics match the old host-f32 path bitwise.
        windows = windows.astype(jnp.float32)
        # fold channels into the batch for the interpolation kernel,
        # then unfold to channels-last.
        N, C = windows.shape[:2]
        wf = windows.reshape((N * C,) + windows.shape[2:])
        mrep = jnp.repeat(M_invs, C, axis=0)
        lorep = jnp.repeat(los, C, axis=0)
        inp = warp_ops.warp_interpolate_batch(
            wf, mrep, lorep, self.patch_shape, discrete=False)
        inp = jnp.moveaxis(inp.reshape((N, C) + self.patch_shape), 1, -1)
        if self.normalize is not None:
            mean, std = self.normalize
            inp = (inp - mean) / std
        if self.augment_fn is not None:
            inp = self.augment_fn(inp, key)
        out = {"inp": inp}  # channels-last (N, pd, ph, pw, C)
        if t_windows is not None:
            t_windows = t_windows.astype(jnp.float32)  # native-int H2D
            Nt, Ct = t_windows.shape[:2]
            tf = t_windows.reshape((Nt * Ct,) + t_windows.shape[2:])
            tgt = warp_ops.warp_interpolate_batch(
                tf, jnp.repeat(M_invs, Ct, axis=0),
                jnp.repeat(los, Ct, axis=0), self.patch_shape,
                discrete=True)
            tgt = tgt.reshape((Nt, Ct) + self.patch_shape)
            if Ct == 1:
                out["target"] = tgt[:, 0].astype(jnp.int32)
            else:
                out["target"] = jnp.moveaxis(tgt, 1, -1).astype(jnp.int32)
        return out

    def __iter__(self) -> Iterator[Dict[str, jnp.ndarray]]:
        for _ in range(self.epoch_size):
            ws, tws, ms, los = [], [], [], []
            for _ in range(self.batch_size):
                w, tw, m, lo = self._sample_one()
                ws.append(w)
                ms.append(m)
                los.append(lo)
                if tw is not None:
                    tws.append(tw)
            self._jax_key, key = jax.random.split(self._jax_key)
            yield self._device_process(
                jnp.asarray(np.stack(ws)),
                jnp.asarray(np.stack(tws)) if tws else None,
                jnp.asarray(np.stack(ms)),
                jnp.asarray(np.stack(los)),
                key)
