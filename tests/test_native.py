"""Native C++ kernel parity tests vs the numpy reference path."""

import numpy as np
import pytest

from elektronn3_tpu.data import coord_transforms as ct
from elektronn3_tpu.ops import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native kernels not buildable")


def test_native_linear_matches_numpy(rng):
    src = rng.normal(size=(10, 12, 14)).astype(np.float32)
    coords = rng.uniform(0.5, 8.0, size=(200, 3)).astype(np.float32)
    lo = np.zeros(3, np.float32)
    a = ct.map_coordinates_linear(src, coords.reshape(200, 1, 1, 3), lo)
    b = native.map_coordinates_linear(src, coords.reshape(200, 1, 1, 3), lo)
    assert np.allclose(a, b, atol=1e-5)


def test_native_nearest_matches_numpy(rng):
    src = rng.normal(size=(10, 12, 14)).astype(np.float32)
    coords = rng.uniform(0.5, 8.0, size=(200, 3)).astype(np.float32)
    lo = np.zeros(3, np.float32)
    a = ct.map_coordinates_nearest(src, coords.reshape(200, 1, 1, 3), lo)
    b = native.map_coordinates_nearest(src, coords.reshape(200, 1, 1, 3), lo)
    assert np.allclose(a, b)


def test_warp_slice_uses_native_consistently(rng):
    """warp_slice output must be identical whether or not native kernels
    are active (they're selected automatically when available)."""
    from elektronn3_tpu.data.sources import ArrayDataSource
    vol = rng.normal(size=(20, 24, 28)).astype(np.float32)
    src = ArrayDataSource(vol)
    M = ct.get_warped_coord_transform(
        vol.shape, (8, 10, 12), rng=np.random.default_rng(42))
    inp_native, _ = ct.warp_slice(src, (8, 10, 12), M)
    # debug=True forces the numpy path
    inp_numpy, _ = ct.warp_slice(src, (8, 10, 12), M, debug=True)
    assert np.allclose(inp_native, inp_numpy, atol=1e-4)
