"""V-Net (arXiv:1606.04797) for 3D volumetric segmentation.

Re-design of reference elektronn3/models/vnet.py:22-172 (itself a
BSD-licensed vendored V-Net) in flax, channels-last. Notable quirks kept
for parity:
- "ContBatchNorm": batch norm that ALWAYS uses batch statistics, even in
  eval mode (vnet.py:22-32). Implemented with
  ``use_running_average=False`` unconditionally.
- Channel reduction factor ``fac`` (vnet.py:127-137).
- PReLU when ``relu=False``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from elektronn3_tpu.modules.layers import PReLU

Dtype = Any


class ContBN(nn.Module):
    """Batch norm always in training mode (batch statistics), but still
    tracking running stats for inspection. Reference vnet.py:22-32."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(use_running_average=False, momentum=0.9,
                            epsilon=1e-5, dtype=self.dtype)(x)


class _Act(nn.Module):
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        if self.relu:
            return nn.relu(x)
        return PReLU()(x)


class LUConv(nn.Module):
    """5x5x5 conv + ContBN + act. Reference vnet.py:35-44."""
    nchan: int
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.nchan, (5, 5, 5), padding="SAME",
                    dtype=self.dtype)(x)
        y = ContBN(dtype=self.dtype)(y)
        return _Act(self.relu)(y)


class InputTransition(nn.Module):
    out_chans: int
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.out_chans, (5, 5, 5), padding="SAME",
                    dtype=self.dtype)(x)
        y = ContBN(dtype=self.dtype)(y)
        return _Act(self.relu)(y)


class DownTransition(nn.Module):
    """Stride-2 down conv + n LUConvs + residual add.
    Reference vnet.py:67-86."""
    in_chans: int
    n_convs: int
    relu: bool = True
    dropout: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        out_chans = 2 * self.in_chans
        down = nn.Conv(out_chans, (2, 2, 2), strides=(2, 2, 2),
                       dtype=self.dtype)(x)
        down = ContBN(dtype=self.dtype)(down)
        down = _Act(self.relu)(down)
        y = down
        if self.dropout:
            y = nn.Dropout(0.5, deterministic=not train)(y)
        for i in range(self.n_convs):
            y = LUConv(out_chans, self.relu, dtype=self.dtype)(y)
        return _Act(self.relu)(y + down)


class UpTransition(nn.Module):
    """Transposed up conv + skip concat + n LUConvs + residual add.
    Reference vnet.py:89-110."""
    out_chans: int
    n_convs: int
    relu: bool = True
    dropout: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skipx, *, train: bool = True):
        if self.dropout:
            x = nn.Dropout(0.5, deterministic=not train)(x)
        skipx = nn.Dropout(0.5, deterministic=not train)(skipx)
        up = nn.ConvTranspose(self.out_chans // 2, (2, 2, 2),
                              strides=(2, 2, 2), dtype=self.dtype)(x)
        up = ContBN(dtype=self.dtype)(up)
        up = _Act(self.relu)(up)
        xcat = jnp.concatenate([up, skipx], axis=-1)
        y = xcat
        for i in range(self.n_convs):
            y = LUConv(xcat.shape[-1], self.relu, dtype=self.dtype)(y)
        return _Act(self.relu)(y + xcat)


class OutputTransition(nn.Module):
    relu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(2, (1, 1, 1), dtype=self.dtype)(x)
        y = ContBN(dtype=self.dtype)(y)
        return _Act(self.relu)(y)


class VNet(nn.Module):
    """V-Net with channel-reduction factor ``fac``.
    Input: (N, D, H, W, 1) channels-last, spatial dims divisible by 16.
    Reference vnet.py:124-172."""
    relu: bool = True
    nll: bool = True
    fac: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        f = self.fac
        out16 = InputTransition(16 // f, self.relu, dtype=self.dtype)(x)
        out32 = DownTransition(16 // f, 1, self.relu,
                               dtype=self.dtype)(out16, train=train)
        out64 = DownTransition(32 // f, 2, self.relu,
                               dtype=self.dtype)(out32, train=train)
        out128 = DownTransition(64 // f, 3, self.relu, dropout=True,
                                dtype=self.dtype)(out64, train=train)
        out256 = DownTransition(128 // f, 2, self.relu, dropout=True,
                                dtype=self.dtype)(out128, train=train)
        out = UpTransition(256 // f, 2, self.relu, dropout=True,
                           dtype=self.dtype)(out256, out128, train=train)
        out = UpTransition(128 // f, 2, self.relu, dropout=True,
                           dtype=self.dtype)(out, out64, train=train)
        out = UpTransition(64 // f, 1, self.relu,
                           dtype=self.dtype)(out, out32, train=train)
        out = UpTransition(32 // f, 1, self.relu,
                           dtype=self.dtype)(out, out16, train=train)
        out = OutputTransition(self.relu, dtype=self.dtype)(out)
        return out.astype(jnp.float32)
