"""2D FCN family (FCN32s/16s/8s/FCNs) on a VGG backbone.

Re-design of reference elektronn3/models/fcn_2d.py:45-251. The reference
uses a torchvision VGG backbone; here the VGG feature extractor is
implemented natively in flax (cfg tables parity with fcn_2d.py:225-238),
with transposed-conv decoders as in the reference.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# VGG configuration tables (reference fcn_2d.py:225-231)
VGG_CFG: Dict[str, List] = {
    "vgg11": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512,
              "M"],
    "vgg13": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"],
    "vgg16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512,
              512, "M", 512, 512, 512, "M"],
    "vgg19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512,
              512, 512, 512, "M", 512, 512, 512, 512, "M"],
}


class VGGNet(nn.Module):
    """VGG feature extractor returning each pooling stage's output
    (x1..x5). Reference fcn_2d.py:196-238."""
    model: str = "vgg16"
    in_channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        outputs = {}
        stage = 1
        for v in VGG_CFG[self.model]:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                outputs[f"x{stage}"] = x
                stage += 1
            else:
                x = nn.Conv(v, (3, 3), padding="SAME", dtype=self.dtype)(x)
                x = nn.relu(x)
        return outputs


class _Deconv(nn.Module):
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(self.features, (3, 3), strides=(2, 2),
                             padding="SAME", dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.BatchNorm(use_running_average=True, dtype=self.dtype)(x)


class FCN32s(nn.Module):
    """Reference fcn_2d.py:45-75."""
    n_class: int = 2
    backbone: str = "vgg16"
    in_channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        feats = VGGNet(self.backbone, self.in_channels,
                       dtype=self.dtype)(x)
        y = feats["x5"]
        for f in [512, 256, 128, 64, 32]:
            y = _Deconv(f, dtype=self.dtype)(y)
        return nn.Conv(self.n_class, (1, 1),
                       dtype=self.dtype)(y).astype(jnp.float32)


class FCN16s(nn.Module):
    """Reference fcn_2d.py:78-110."""
    n_class: int = 2
    backbone: str = "vgg16"
    in_channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        feats = VGGNet(self.backbone, self.in_channels,
                       dtype=self.dtype)(x)
        y = _Deconv(512, dtype=self.dtype)(feats["x5"])
        y = y + feats["x4"]
        for f in [256, 128, 64, 32]:
            y = _Deconv(f, dtype=self.dtype)(y)
        return nn.Conv(self.n_class, (1, 1),
                       dtype=self.dtype)(y).astype(jnp.float32)


class FCN8s(nn.Module):
    """Reference fcn_2d.py:113-147."""
    n_class: int = 2
    backbone: str = "vgg16"
    in_channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        feats = VGGNet(self.backbone, self.in_channels,
                       dtype=self.dtype)(x)
        y = _Deconv(512, dtype=self.dtype)(feats["x5"])
        y = y + feats["x4"]
        y = _Deconv(256, dtype=self.dtype)(y)
        y = y + feats["x3"]
        for f in [128, 64, 32]:
            y = _Deconv(f, dtype=self.dtype)(y)
        return nn.Conv(self.n_class, (1, 1),
                       dtype=self.dtype)(y).astype(jnp.float32)


class FCNs(nn.Module):
    """All-skip FCN (reference fcn_2d.py:150-193)."""
    n_class: int = 2
    backbone: str = "vgg16"
    in_channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        feats = VGGNet(self.backbone, self.in_channels,
                       dtype=self.dtype)(x)
        y = _Deconv(512, dtype=self.dtype)(feats["x5"])
        y = y + feats["x4"]
        y = _Deconv(256, dtype=self.dtype)(y)
        y = y + feats["x3"]
        y = _Deconv(128, dtype=self.dtype)(y)
        y = y + feats["x2"]
        y = _Deconv(64, dtype=self.dtype)(y)
        y = y + feats["x1"]
        y = _Deconv(32, dtype=self.dtype)(y)
        return nn.Conv(self.n_class, (1, 1),
                       dtype=self.dtype)(y).astype(jnp.float32)
