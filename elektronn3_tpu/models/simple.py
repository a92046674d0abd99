"""Simple test CNNs and img2scalar classifiers.

Re-design of reference elektronn3/models/simple.py:8-167 in flax,
channels-last.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class Simple3DNet(nn.Module):
    """3 conv layers. Reference simple.py:8-21."""
    n_out_channels: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        x = nn.relu(nn.Conv(10, (3, 3, 3), padding="SAME",
                            dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(10, (3, 3, 3), padding="SAME",
                            dtype=self.dtype)(x))
        return nn.Conv(self.n_out_channels, (1, 1, 1),
                       dtype=self.dtype)(x).astype(jnp.float32)


class Extended3DNet(nn.Module):
    """Deeper net with pooling + upsample back to input size.
    Reference simple.py:23-42."""
    n_out_channels: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        spatial = x.shape[1:-1]
        x = nn.relu(nn.Conv(64, (5, 5, 5), padding="SAME",
                            dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(64, (5, 5, 5), padding="SAME",
                            dtype=self.dtype)(x))
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        x = nn.relu(nn.Conv(64, (3, 3, 3), padding=2, dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(64, (3, 3, 3), padding="SAME",
                            dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(64, (3, 3, 3), padding="VALID",
                            dtype=self.dtype)(x))
        x = nn.Conv(self.n_out_channels, (1, 1, 1), dtype=self.dtype)(x)
        new_shape = x.shape[:1] + spatial + x.shape[-1:]
        return jax.image.resize(x, new_shape,
                                method="nearest").astype(jnp.float32)


class N3DNet(nn.Module):
    """Anisotropic conv stack + upsample. Reference simple.py:44-65."""
    n_out_channels: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        spatial = x.shape[1:-1]
        specs = [(20, (1, 5, 5)), (30, (1, 5, 5))]
        for f, k in specs:
            x = nn.relu(nn.Conv(f, k, padding="SAME", dtype=self.dtype)(x))
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
        for f, k in [(40, (1, 5, 5)), (80, (3, 3, 3)), (100, (3, 3, 3)),
                     (150, (1, 3, 3))]:
            x = nn.relu(nn.Conv(f, k, padding="SAME", dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(50, (1, 1, 1), dtype=self.dtype)(x))
        x = nn.Conv(self.n_out_channels, (1, 1, 1), dtype=self.dtype)(x)
        new_shape = x.shape[:1] + spatial + x.shape[-1:]
        return jax.image.resize(x, new_shape,
                                method="nearest").astype(jnp.float32)


class Conv3DLayer(nn.Module):
    """Conv + (BN) + act + (pool) + (dropout). Reference simple.py:67-86."""
    out_channels: int
    kernel_size: Tuple[int, int, int]
    batch_norm: bool = True
    pooling: Optional[Tuple[int, int, int]] = None
    dropout_rate: Optional[float] = None
    act: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(self.out_channels, self.kernel_size, padding="VALID",
                    dtype=self.dtype)(x)
        if self.batch_norm:
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype)(x)
        x = nn.relu(x) if self.act == "relu" else nn.leaky_relu(x)
        if self.pooling is not None:
            x = nn.max_pool(x, self.pooling, strides=self.pooling)
        if self.dropout_rate is not None:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x


def _adaptive_avg_pool_1d(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """(B, L) -> (B, out_len) adaptive average pooling."""
    b, l = x.shape
    if l == out_len:
        return x
    if l % out_len == 0:
        return jnp.mean(x.reshape(b, out_len, l // out_len), axis=-1)
    # torch-equivalent uneven binning
    idx = [(int(jnp.floor(i * l / out_len)), int(-(-((i + 1) * l) // out_len)))
           for i in range(out_len)]
    return jnp.stack([jnp.mean(x[:, lo:hi], axis=-1) for lo, hi in idx],
                     axis=-1)


class StackedConv2Scalar(nn.Module):
    """img2scalar classifier: anisotropic conv stack → adaptive pool →
    MLP. Reference simple.py:88-126."""
    in_channels: int
    n_classes: int
    dropout_rate: float = 0.05
    act: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        specs = [(20, (1, 5, 5), (1, 2, 2)), (30, (1, 5, 5), (1, 2, 2)),
                 (40, (1, 4, 4), (1, 2, 2)), (50, (1, 4, 4), (1, 2, 2)),
                 (60, (1, 2, 2), (1, 2, 2)), (70, (1, 1, 1), (1, 2, 2)),
                 (70, (1, 1, 1), None)]
        for f, k, p in specs:
            x = Conv3DLayer(f, k, pooling=p,
                            dropout_rate=self.dropout_rate, act=self.act,
                            dtype=self.dtype)(x, train)
        x = x.reshape(x.shape[0], -1)
        x = _adaptive_avg_pool_1d(x, 100)
        act = nn.relu if self.act == "relu" else nn.leaky_relu
        x = act(nn.Dense(50, dtype=self.dtype)(x))
        x = act(nn.Dense(30, dtype=self.dtype)(x))
        return nn.Dense(self.n_classes,
                        dtype=self.dtype)(x).astype(jnp.float32)


class StackedConv2ScalarWithLatentAdd(nn.Module):
    """Same as StackedConv2Scalar but with scalar features fused into the
    MLP input. Reference simple.py:128-167."""
    in_channels: int
    n_classes: int
    dropout_rate: float = 0.05
    act: str = "relu"
    n_scalar: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, scal, *, train: bool = True):
        specs = [(20, (1, 5, 5), (1, 2, 2)), (30, (1, 5, 5), (1, 2, 2)),
                 (40, (1, 4, 4), (1, 2, 2)), (50, (1, 4, 4), (1, 2, 2)),
                 (60, (1, 2, 2), (1, 2, 2)), (70, (1, 1, 1), (1, 2, 2)),
                 (70, (1, 1, 1), None)]
        for f, k, p in specs:
            x = Conv3DLayer(f, k, pooling=p,
                            dropout_rate=self.dropout_rate, act=self.act,
                            dtype=self.dtype)(x, train)
        x = x.reshape(x.shape[0], -1)
        x = _adaptive_avg_pool_1d(x, 100)
        x = jnp.concatenate([x, scal.astype(x.dtype)], axis=-1)
        act = nn.relu if self.act == "relu" else nn.leaky_relu
        x = act(nn.Dense(50, dtype=self.dtype)(x))
        x = act(nn.Dense(30, dtype=self.dtype)(x))
        return nn.Dense(self.n_classes,
                        dtype=self.dtype)(x).astype(jnp.float32)
