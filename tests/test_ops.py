"""On-device warp/augmentation op tests (parity vs host numpy path)."""

import jax
import jax.numpy as jnp
import numpy as np

from elektronn3_tpu.data import coord_transforms as ct
from elektronn3_tpu.ops import warp as W


def test_device_warp_matches_host(rng):
    """Device warp_interpolate must match the host numpy trilinear path
    for the same matrix."""
    vol = rng.normal(size=(24, 28, 32)).astype(np.float32)
    from elektronn3_tpu.data.sources import ArrayDataSource
    # Retry until an in-bounds random transform is drawn (same retry
    # strategy as PatchCreator).
    for seed in range(100):
        M = ct.get_warped_coord_transform(
            vol.shape, (8, 10, 12), rng=np.random.default_rng(seed))
        try:
            inp_host, _ = ct.warp_slice(ArrayDataSource(vol), (8, 10, 12),
                                        M, debug=True)
            break
        except ct.WarpingOOBError:
            continue
    else:
        raise AssertionError("no in-bounds warp found")
    M_inv = np.linalg.inv(M.astype(np.float64)).astype(np.float32)
    # Device path: window = whole volume, lo = 0
    out_dev = W.warp_interpolate(
        jnp.asarray(vol), jnp.asarray(M_inv), jnp.zeros(3),
        (8, 10, 12), discrete=False)
    assert np.allclose(np.asarray(out_dev), inp_host[0], atol=1e-3)


def test_device_warp_discrete(rng):
    lab = rng.integers(0, 5, size=(24, 28, 32)).astype(np.float32)
    M = ct.get_warped_coord_transform(
        lab.shape, (8, 8, 8), rng=np.random.default_rng(3))
    M_inv = np.linalg.inv(M.astype(np.float64)).astype(np.float32)
    out = W.warp_interpolate(jnp.asarray(lab), jnp.asarray(M_inv),
                             jnp.zeros(3), (8, 8, 8), discrete=True)
    assert set(np.unique(np.asarray(out))).issubset(set(np.unique(lab)))


def test_device_warp_batch(rng):
    vols = rng.normal(size=(4, 16, 16, 16)).astype(np.float32)
    Ms = np.stack([np.linalg.inv(ct.get_warped_coord_transform(
        vols.shape[1:], (6, 6, 6), rng=np.random.default_rng(i)))
        for i in range(4)]).astype(np.float32)
    los = np.zeros((4, 3), np.float32)
    out = W.warp_interpolate_batch(
        jnp.asarray(vols), jnp.asarray(Ms), jnp.asarray(los), (6, 6, 6))
    assert out.shape == (4, 6, 6, 6)
    assert np.all(np.isfinite(np.asarray(out)))


def test_device_augmentations(rng):
    x = jnp.asarray(rng.uniform(0, 1, size=(2, 8, 8, 1)), jnp.float32)
    key = jax.random.PRNGKey(0)
    for fn in [
        lambda: W.random_brightness_contrast(x, key),
        lambda: W.additive_gaussian_noise(x, key),
        lambda: W.random_gamma(x, key),
    ]:
        out = fn()
        assert out.shape == x.shape
        assert np.all(np.isfinite(np.asarray(out)))
        assert not np.allclose(np.asarray(out), np.asarray(x))
    # prob=0 -> identity
    out = W.random_brightness_contrast(x, key, prob=0.0)
    assert np.allclose(np.asarray(out), np.asarray(x))
    # normalize
    out = W.normalize(x, 0.5, 2.0)
    assert np.allclose(np.asarray(out), (np.asarray(x) - 0.5) / 2.0)
