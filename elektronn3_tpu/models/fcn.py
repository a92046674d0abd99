"""Volumetric (3D) FCN 32s/16s/8s with VGG-style encoder and trilinear
score upsampling/fusion.

Re-design of reference elektronn3/models/fcn.py:17-351 in flax,
channels-last. The channel-reduction factor ``red_fac`` divides all VGG
channel counts. Instead of the reference's pad-100 + implicit-crop
construction (a CPU/torch legacy from Caffe), scores are fused by
resizing to a common spatial shape — same function, XLA-friendly.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _resize_to(x, spatial):
    new_shape = x.shape[:1] + tuple(spatial) + x.shape[-1:]
    return jax.image.resize(x, new_shape, method="linear")


class _VGGBlock(nn.Module):
    features: int
    n_convs: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_convs):
            x = nn.Conv(self.features, (3, 3, 3), padding="SAME",
                        dtype=self.dtype)(x)
            x = nn.relu(x)
        return nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))


class _Classifier(nn.Module):
    n_classes: int
    hidden: int
    train: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        x = nn.Conv(self.hidden, (3, 3, 3), padding="SAME",
                    dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return nn.Conv(self.n_classes, (1, 1, 1), dtype=self.dtype)(x)


class fcn32s(nn.Module):
    """FCN-32s: single 32x-upsampled score. Reference fcn.py:17-126."""
    n_classes: int = 2
    red_fac: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        r = self.red_fac
        spatial = x.shape[1:-1]
        for f, n in [(64, 1), (128, 1), (256, 1), (512, 1), (512, 1)]:
            x = _VGGBlock(f // r, n, dtype=self.dtype)(x)
        score = _Classifier(self.n_classes, 4096 // r,
                            dtype=self.dtype)(x, train=train)
        return _resize_to(score, spatial).astype(jnp.float32)


class fcn16s(nn.Module):
    """FCN-16s: fuse pool4 score. Reference fcn.py:126-240."""
    n_classes: int = 2
    red_fac: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        r = self.red_fac
        spatial = x.shape[1:-1]
        feats = []
        for f, n in [(64, 1), (128, 1), (256, 1), (512, 1), (512, 1)]:
            x = _VGGBlock(f // r, n, dtype=self.dtype)(x)
            feats.append(x)
        score = _Classifier(self.n_classes, 4096 // r,
                            dtype=self.dtype)(x, train=train)
        score_pool4 = nn.Conv(self.n_classes, (1, 1, 1),
                              dtype=self.dtype)(feats[3])
        score = _resize_to(score, score_pool4.shape[1:-1]) + score_pool4
        return _resize_to(score, spatial).astype(jnp.float32)


class fcn8s(nn.Module):
    """FCN-8s: fuse pool4 + pool3 scores. Reference fcn.py:240-351."""
    n_classes: int = 2
    red_fac: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        r = self.red_fac
        spatial = x.shape[1:-1]
        feats = []
        for f, n in [(64, 1), (128, 1), (256, 1), (512, 1), (512, 1)]:
            x = _VGGBlock(f // r, n, dtype=self.dtype)(x)
            feats.append(x)
        score = _Classifier(self.n_classes, 4096 // r,
                            dtype=self.dtype)(x, train=train)
        score_pool4 = nn.Conv(self.n_classes, (1, 1, 1),
                              dtype=self.dtype)(feats[3])
        score_pool3 = nn.Conv(self.n_classes, (1, 1, 1),
                              dtype=self.dtype)(feats[2])
        score = _resize_to(score, score_pool4.shape[1:-1]) + score_pool4
        score = _resize_to(score, score_pool3.shape[1:-1]) + score_pool3
        return _resize_to(score, spatial).astype(jnp.float32)
