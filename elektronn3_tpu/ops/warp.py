"""On-device (XLA) warp interpolation and augmentation.

The TPU-native realization of the reference's coordinate-warping
augmentation (coord_transforms.py): the host only picks the random 4x4
matrix, does the cheap corner OOB check and reads a bounding window from
HDF5; the per-voxel transform + trilinear/nearest interpolation runs on
the device, fused by XLA into the training step's program (no host
round-trip for the heavy part, BASELINE.json north-star).

All functions are jit-compatible with static patch shapes.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _rowgather_enabled() -> bool:
    # E3TPU_ROWGATHER=0 reverts to the per-element XLA gather
    # formulation (for A/B benchmarking; numerics are identical).
    return os.environ.get("E3TPU_ROWGATHER", "1") != "0"


def _gather_lanes(rows: jnp.ndarray, e: jnp.ndarray) -> jnp.ndarray:
    """Fetch flat elements ``e`` from a (M, 128) lane-row view.

    XLA:TPU lowers per-element gathers to ~1e8 scalar fetches/s (the
    measured warp hot path, round 5), but row gathers of the 128-lane
    MINOR dim run at memory bandwidth (~108 GB/s measured on the v5e).
    So: fetch each element's whole 512 B lane-row, then select the
    lane ARITHMETICALLY (iota compare + sum — one nonzero term, so the
    result is bit-exact vs the scalar gather). ~15x faster than the
    scalar-gather formulation at warp-interpolation shapes."""
    r = e // 128
    l = e - r * 128
    rv = jnp.take(rows, r.reshape(-1), axis=0)      # (n, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, rv.shape, 1)
    val = jnp.sum(rv * (lane == l.reshape(-1, 1)), axis=1)
    return val.reshape(e.shape)


def _lane_rows(window: jnp.ndarray) -> jnp.ndarray:
    """Flatten a (D, H, W) window into (ceil(DHW/128), 128) f32 rows."""
    flat = window.reshape(-1).astype(jnp.float32)
    m = -(-flat.shape[0] // 128)
    return jnp.pad(flat, (0, m * 128 - flat.shape[0])).reshape(m, 128)


def dest_coords(patch_shape: Sequence[int]) -> jnp.ndarray:
    """Homogeneous (z, y, x, 1) coordinate grid, shape patch + (4,)."""
    zz, yy, xx = jnp.meshgrid(
        jnp.arange(patch_shape[0], dtype=jnp.float32),
        jnp.arange(patch_shape[1], dtype=jnp.float32),
        jnp.arange(patch_shape[2], dtype=jnp.float32),
        indexing="ij")
    return jnp.stack([zz, yy, xx, jnp.ones_like(zz)], axis=-1)


@partial(jax.jit, static_argnames=("patch_shape", "discrete"))
def warp_interpolate(window: jnp.ndarray, M_inv: jnp.ndarray,
                     lo: jnp.ndarray, patch_shape: Tuple[int, int, int],
                     discrete: bool = False) -> jnp.ndarray:
    """Warp-sample a patch from a source ``window``.

    Args:
        window: (D, H, W) source window (already sliced on host).
        M_inv: (4, 4) inverse transform (dest coords -> src coords).
        lo: (3,) float offset of the window within the source volume.
        patch_shape: static output spatial shape.
        discrete: nearest-neighbor (labels) vs trilinear (images).

    Coordinates are clamped to the window bounds (the host's corner
    pre-check guarantees in-bounds reads for accepted samples, so
    clamping only guards float rounding at the edges — the reference
    relies on unchecked reads instead, coord_transforms.py:38-43).
    """
    grid = dest_coords(patch_shape)  # (pd, ph, pw, 4)
    src = jnp.einsum("...j,ij->...i", grid, M_inv)
    hdiv = src[..., 3:4]
    src = src[..., :3] / hdiv
    rel = src - lo

    D, H, W = window.shape
    maxi = jnp.array([D - 1, H - 1, W - 1], jnp.float32)
    rows = _lane_rows(window) if _rowgather_enabled() else None
    if discrete:
        idx = jnp.clip(jnp.round(rel), 0, maxi).astype(jnp.int32)
        if rows is None:
            return window[idx[..., 0], idx[..., 1], idx[..., 2]]
        e = (idx[..., 0] * H + idx[..., 1]) * W + idx[..., 2]
        return _gather_lanes(rows, e).astype(window.dtype)
    c0 = jnp.clip(jnp.floor(rel), 0, maxi - 1)
    d = rel - c0
    i0 = c0.astype(jnp.int32)
    iz, iy, ix = i0[..., 0], i0[..., 1], i0[..., 2]
    dz, dy, dx = d[..., 0], d[..., 1], d[..., 2]

    if rows is None:
        def g(oz, oy, ox):
            return window[iz + oz, iy + oy, ix + ox]
    else:
        base = (iz * H + iy) * W + ix

        def g(oz, oy, ox):
            return _gather_lanes(rows, base + (oz * H + oy) * W + ox)

    return (g(0, 0, 0) * (1 - dz) * (1 - dy) * (1 - dx)
            + g(1, 0, 0) * dz * (1 - dy) * (1 - dx)
            + g(0, 1, 0) * (1 - dz) * dy * (1 - dx)
            + g(0, 0, 1) * (1 - dz) * (1 - dy) * dx
            + g(1, 0, 1) * dz * (1 - dy) * dx
            + g(0, 1, 1) * (1 - dz) * dy * dx
            + g(1, 1, 0) * dz * dy * (1 - dx)
            + g(1, 1, 1) * dz * dy * dx)


@partial(jax.jit, static_argnames=("patch_shape", "discrete"))
def warp_interpolate_batch(windows: jnp.ndarray, M_invs: jnp.ndarray,
                           los: jnp.ndarray,
                           patch_shape: Tuple[int, int, int],
                           discrete: bool = False) -> jnp.ndarray:
    """Batched warp over (static-shape) windows — the device-side
    PatchCreator hot path.

    windows: (N, D, H, W); M_invs: (N, 4, 4); los: (N, 3).
    Returns (N,) + patch_shape.

    The batch is handled by a trace-time PYTHON loop over windows, not
    a vmap: a vmapped gather has a batched operand, which XLA:TPU
    lowers back to the slow scalar-fetch path, and ONE stacked
    (N*M, 128) operand (46 MB at loader shapes) is too large for
    XLA's memory-space assignment to pin in VMEM, leaving most taps'
    row gathers at HBM-random rates (measured 88 GiB/s vs 530 GiB/s
    VMEM-pinned; the full-batch call measured 210 -> 198 ms). With
    per-window (m, 128) sources (~5.8 MB) every tap's gather source is
    VMEM-pinned: 210 -> 62 ms measured on the v5e at loader shapes
    (N=8 windows (74,140,140) -> patches (44,88,88)). Bit-exact vs the
    vmapped scalar-gather formulation.
    """
    if not _rowgather_enabled():
        return jax.vmap(
            lambda w, m, l: warp_interpolate(w, m, l, patch_shape,
                                             discrete)
        )(windows, M_invs, los)
    return jnp.stack([
        warp_interpolate(windows[n], M_invs[n], los[n], patch_shape,
                         discrete)
        for n in range(windows.shape[0])])


# ---------------------------------------------------------------------------
# On-device elastic deformation (reference WIP inline elastic,
# coord_transforms.py:395-418: smoothed random displacement added to the
# source coordinates so augmentation needs no second interpolation pass)
# ---------------------------------------------------------------------------

def _gaussian_kernel1d(sigma: float) -> jnp.ndarray:
    radius = max(1, int(3.0 * sigma + 0.5))
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _smooth3d(field: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable gaussian smoothing of a (D, H, W) field (zero-padded
    borders, like scipy mode='constant')."""
    k = _gaussian_kernel1d(sigma)
    r = (k.shape[0] - 1) // 2
    x = field[None, ..., None]  # (1, D, H, W, 1)
    for axis in range(3):
        kshape = [1, 1, 1]
        kshape[axis] = k.shape[0]
        kern = k.reshape(kshape + [1, 1])
        x = jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1, 1),
            padding=[(r, r) if a == axis else (0, 0) for a in range(3)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return x[0, ..., 0]


def elastic_displacement(key: jax.Array, patch_shape: Tuple[int, int, int],
                         sigma: float = 4.0, alpha: float = 40.0,
                         aniso_factor: float = 1.0) -> jnp.ndarray:
    """Random smoothed displacement field, shape patch + (3,).

    Per-dimension: gaussian_filter(U(-1,1), sigma) * alpha, with the z
    component divided by ``aniso_factor`` (reference
    coord_transforms.py:400-414).
    """
    keys = jax.random.split(key, 3)
    comps = []
    for i in range(3):
        noise = jax.random.uniform(keys[i], patch_shape, jnp.float32,
                                   -1.0, 1.0)
        d = _smooth3d(noise, sigma) * alpha
        if i == 0 and aniso_factor != 1.0:
            d = d / aniso_factor
        comps.append(d)
    return jnp.stack(comps, axis=-1)


@partial(jax.jit, static_argnames=("patch_shape", "discrete"))
def warp_interpolate_elastic(window: jnp.ndarray, M_inv: jnp.ndarray,
                             lo: jnp.ndarray,
                             displacement: jnp.ndarray,
                             patch_shape: Tuple[int, int, int],
                             discrete: bool = False) -> jnp.ndarray:
    """warp_interpolate with an additive source-coordinate displacement
    field (elastic deformation fused into the same gather — no second
    interpolation pass). Displaced coordinates are clamped to the window
    (reference clips to the read bounds, coord_transforms.py:415-418).
    """
    grid = dest_coords(patch_shape)
    src = jnp.einsum("...j,ij->...i", grid, M_inv)
    src = src[..., :3] / src[..., 3:4]
    rel = src - lo + displacement

    D, H, W = window.shape
    maxi = jnp.array([D - 1, H - 1, W - 1], jnp.float32)
    if discrete:
        idx = jnp.clip(jnp.round(rel), 0, maxi).astype(jnp.int32)
        return window[idx[..., 0], idx[..., 1], idx[..., 2]]
    c0 = jnp.clip(jnp.floor(rel), 0, maxi - 1)
    d = jnp.clip(rel, 0, maxi) - c0
    i0 = c0.astype(jnp.int32)
    iz, iy, ix = i0[..., 0], i0[..., 1], i0[..., 2]
    dz, dy, dx = d[..., 0], d[..., 1], d[..., 2]

    def g(oz, oy, ox):
        return window[iz + oz, iy + oy, ix + ox]

    return (g(0, 0, 0) * (1 - dz) * (1 - dy) * (1 - dx)
            + g(1, 0, 0) * dz * (1 - dy) * (1 - dx)
            + g(0, 1, 0) * (1 - dz) * dy * (1 - dx)
            + g(0, 0, 1) * (1 - dz) * (1 - dy) * dx
            + g(1, 0, 1) * dz * (1 - dy) * dx
            + g(0, 1, 1) * (1 - dz) * dy * dx
            + g(1, 1, 0) * dz * dy * (1 - dx)
            + g(1, 1, 1) * dz * dy * dx)


# ---------------------------------------------------------------------------
# On-device photometric augmentations (fusable into the same program)
# ---------------------------------------------------------------------------

def random_brightness_contrast(x: jnp.ndarray, rng: jax.Array,
                               brightness_std: float = 0.5,
                               contrast_std: float = 0.5,
                               prob: float = 1.0) -> jnp.ndarray:
    """Per-sample brightness/contrast jitter on (N, *spatial, C).
    Device analog of transforms.RandomBrightnessContrast."""
    n = x.shape[0]
    kb, kc, kp = jax.random.split(rng, 3)
    shape = (n,) + (1,) * (x.ndim - 1)
    a = 1 + jax.random.normal(kc, shape) * contrast_std
    b = jax.random.normal(kb, shape) * brightness_std
    m = jnp.mean(x, axis=tuple(range(1, x.ndim)), keepdims=True)
    aug = a * (x - m) + m + b
    apply = jax.random.bernoulli(kp, prob, shape)
    return jnp.where(apply, aug, x)


def additive_gaussian_noise(x: jnp.ndarray, rng: jax.Array,
                            sigma: float = 0.1,
                            prob: float = 1.0) -> jnp.ndarray:
    """Device analog of transforms.AdditiveGaussianNoise."""
    kn, kp = jax.random.split(rng)
    noise = jax.random.normal(kn, x.shape, x.dtype) * sigma
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    apply = jax.random.bernoulli(kp, prob, shape)
    return x + jnp.where(apply, noise, 0)


def random_gamma(x: jnp.ndarray, rng: jax.Array,
                 gamma_std: float = 0.5, prob: float = 1.0) -> jnp.ndarray:
    """Device analog of transforms.RandomGammaCorrection (per-sample
    gamma on min-max-normalized values, rescaled back)."""
    kg, kp = jax.random.split(rng)
    n = x.shape[0]
    shape = (n,) + (1,) * (x.ndim - 1)
    gamma = jnp.exp(jax.random.normal(kg, shape) * gamma_std)
    axes = tuple(range(1, x.ndim))
    lo = jnp.min(x, axis=axes, keepdims=True)
    hi = jnp.max(x, axis=axes, keepdims=True)
    rngspan = jnp.maximum(hi - lo, 1e-8)
    x01 = (x - lo) / rngspan
    aug = jnp.power(x01, gamma) * rngspan + lo
    apply = jax.random.bernoulli(kp, prob, shape)
    return jnp.where(apply, aug, x)


def normalize(x: jnp.ndarray, mean, std) -> jnp.ndarray:
    """Per-channel (last axis) normalization on device."""
    mean = jnp.asarray(mean, x.dtype)
    std = jnp.asarray(std, x.dtype)
    return (x - mean) / std
