"""UNet3dLite: fixed-shape valid-conv ELEKTRONN2 port.

Re-design of reference elektronn3/models/unet3d_lite.py:11-116 in flax,
channels-last. Only spatial input shape (22, 140, 140) is supported;
fov=[12, 88, 88], offsets=[6, 44, 44], output spatial shape [10, 52, 52].
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class PoolingError(Exception):
    pass


def _autocrop(from_down, from_up):
    """Center-crop encoder features to the decoder's spatial shape.
    Reference unet3d_lite.py:51-62."""
    ds = from_down.shape[1:-1]
    us = from_up.shape[1:-1]
    slc = (slice(None),) + tuple(
        slice((d - u) // 2, (d + u) // 2) for d, u in zip(ds, us)
    ) + (slice(None),)
    return from_down[slc], from_up


def _down(x, ks=(1, 2, 2)):
    """Pool with explicit divisibility guard. Reference
    unet3d_lite.py:63-74."""
    sh = x.shape[1:-1]
    if any(s % k != 0 for s, k in zip(sh, ks)):
        raise PoolingError(
            f"Can't pool {sh} input by a {ks} kernel. Please adjust the "
            "input shape.")
    return nn.max_pool(x, ks, strides=ks)


class UNet3dLite(nn.Module):
    """Input (N, 22, 140, 140, 1) → output (N, 10, 52, 52, 2)."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        def conv(f, ks, name):
            return nn.Conv(f, ks, padding="VALID", dtype=self.dtype,
                           name=name)

        relu = nn.relu
        conv0 = relu(conv(32, (1, 3, 3), "conv0")(x))
        conv1 = relu(conv(32, (1, 3, 3), "conv1")(conv0))
        down0 = _down(conv1)
        conv2 = relu(conv(64, (1, 3, 3), "conv2")(down0))
        conv3 = relu(conv(64, (1, 3, 3), "conv3")(conv2))
        down1 = _down(conv3)
        conv4 = relu(conv(128, (1, 3, 3), "conv4")(down1))
        conv5 = relu(conv(128, (1, 3, 3), "conv5")(conv4))
        down2 = _down(conv5)
        conv6 = relu(conv(256, (3, 3, 3), "conv6")(down2))
        conv7 = relu(conv(128, (3, 3, 3), "conv7")(conv6))

        up0 = relu(nn.ConvTranspose(512, (1, 2, 2), strides=(1, 2, 2),
                                    dtype=self.dtype,
                                    name="upconv0")(conv7))
        d0, u0 = _autocrop(conv5, up0)
        m = jnp.concatenate([d0, u0], axis=-1)
        m = relu(conv(256, (1, 3, 3), "mconv0")(m))
        m = relu(conv(64, (1, 3, 3), "mconv1")(m))

        up1 = relu(nn.ConvTranspose(256, (1, 2, 2), strides=(1, 2, 2),
                                    dtype=self.dtype, name="upconv1")(m))
        d1, u1 = _autocrop(conv3, up1)
        m = jnp.concatenate([d1, u1], axis=-1)
        m = relu(conv(128, (3, 3, 3), "mconv2")(m))
        m = relu(conv(32, (3, 3, 3), "mconv3")(m))

        up2 = relu(nn.ConvTranspose(128, (1, 2, 2), strides=(1, 2, 2),
                                    dtype=self.dtype, name="upconv2")(m))
        d2, u2 = _autocrop(conv1, up2)
        m = jnp.concatenate([d2, u2], axis=-1)
        m = relu(conv(64, (3, 3, 3), "mconv4")(m))
        m = relu(conv(64, (3, 3, 3), "mconv5")(m))

        out = nn.Conv(2, (1, 1, 1), dtype=self.dtype,
                      name="conv_final")(m)
        return out.astype(jnp.float32)
