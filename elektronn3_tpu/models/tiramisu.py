"""FC-DenseNet "Tiramisu" (arXiv:1611.09326) for 2D segmentation.

Re-design of reference elektronn3/models/tiramisu_2d.py:16-211 in flax,
channels-last. Output is raw logits (the reference appends LogSoftmax;
here losses handle normalization, consistent with the rest of the
model zoo).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class DenseLayer(nn.Module):
    """BN → ReLU → 3x3 conv → dropout. Reference tiramisu_2d.py:131-142."""
    growth_rate: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Conv(self.growth_rate, (3, 3), padding="SAME",
                    dtype=self.dtype)(y)
        return nn.Dropout(0.2, deterministic=not train)(y)


class DenseBlock(nn.Module):
    """Reference tiramisu_2d.py:144-166: ``upsample=True`` returns only
    the new features (not the input concat)."""
    growth_rate: int
    n_layers: int
    upsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        new_features = []
        for i in range(self.n_layers):
            out = DenseLayer(self.growth_rate, dtype=self.dtype)(x, train)
            x = jnp.concatenate([x, out], axis=-1)
            new_features.append(out)
        if self.upsample:
            return jnp.concatenate(new_features, axis=-1)
        return x


class TransitionDown(nn.Module):
    """BN → ReLU → 1x1 conv → dropout → 2x2 maxpool.
    Reference tiramisu_2d.py:169-182."""
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        y = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        y = nn.relu(y)
        y = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype)(y)
        y = nn.Dropout(0.2, deterministic=not train)(y)
        return nn.max_pool(y, (2, 2), strides=(2, 2))


class TransitionUp(nn.Module):
    """Stride-2 transposed conv + center-crop to skip + concat.
    Reference tiramisu_2d.py:185-196."""
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        y = nn.ConvTranspose(self.out_channels, (3, 3), strides=(2, 2),
                             dtype=self.dtype)(x)
        # Center-crop to skip's spatial shape
        h, w = y.shape[1], y.shape[2]
        th, tw = skip.shape[1], skip.shape[2]
        y = y[:, (h - th) // 2:(h - th) // 2 + th,
              (w - tw) // 2:(w - tw) // 2 + tw]
        return jnp.concatenate([y, skip], axis=-1)


class FCDenseNet(nn.Module):
    """Fully-convolutional DenseNet. Reference tiramisu_2d.py:16-107."""
    in_channels: int = 3
    down_blocks: Sequence[int] = (5, 5, 5, 5, 5)
    up_blocks: Sequence[int] = (5, 5, 5, 5, 5)
    bottleneck_layers: int = 5
    growth_rate: int = 16
    out_chans_first_conv: int = 48
    n_classes: int = 12
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        out = nn.Conv(self.out_chans_first_conv, (3, 3), padding="SAME",
                      dtype=self.dtype, name="firstconv")(x)
        skips = []
        for i, n in enumerate(self.down_blocks):
            out = DenseBlock(self.growth_rate, n,
                             dtype=self.dtype, name=f"dense_down_{i}")(
                out, train)
            skips.append(out)
            out = TransitionDown(dtype=self.dtype,
                                 name=f"trans_down_{i}")(out, train)
        out = DenseBlock(self.growth_rate, self.bottleneck_layers,
                         upsample=True, dtype=self.dtype,
                         name="bottleneck")(out, train)
        for i, n in enumerate(self.up_blocks):
            skip = skips.pop()
            out = TransitionUp(out.shape[-1], dtype=self.dtype,
                               name=f"trans_up_{i}")(out, skip)
            last = i == len(self.up_blocks) - 1
            out = DenseBlock(self.growth_rate, n, upsample=not last,
                             dtype=self.dtype, name=f"dense_up_{i}")(
                out, train)
        out = nn.Conv(self.n_classes, (1, 1), dtype=self.dtype,
                      name="finalConv")(out)
        return out.astype(jnp.float32)


def FCDenseNet57(n_classes: int, in_channels: int = 3, **kw) -> FCDenseNet:
    return FCDenseNet(in_channels=in_channels, down_blocks=(4,) * 5,
                      up_blocks=(4,) * 5, bottleneck_layers=4,
                      growth_rate=12, out_chans_first_conv=48,
                      n_classes=n_classes, **kw)


def FCDenseNet67(n_classes: int, in_channels: int = 3, **kw) -> FCDenseNet:
    return FCDenseNet(in_channels=in_channels, down_blocks=(5,) * 5,
                      up_blocks=(5,) * 5, bottleneck_layers=5,
                      growth_rate=16, out_chans_first_conv=48,
                      n_classes=n_classes, **kw)


def FCDenseNet103(n_classes: int, in_channels: int = 3, **kw) -> FCDenseNet:
    return FCDenseNet(in_channels=in_channels, down_blocks=(4, 5, 7, 10, 12),
                      up_blocks=(12, 10, 7, 5, 4), bottleneck_layers=15,
                      growth_rate=16, out_chans_first_conv=48,
                      n_classes=n_classes, **kw)
