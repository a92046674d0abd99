"""L1-norm batch/group normalization (π/2-scaled), for low-precision
stability.

Reference: elektronn3/modules/l1batchnorm.py:14-121. The L1 deviation
``mean(|x - mean|) * sqrt(pi/2)`` estimates the std without squaring,
which keeps bf16/fp16 training stable (arXiv:1802.09769).
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any
_SQRT_HALF_PI = math.sqrt(math.pi / 2)


class L1BatchNorm(nn.Module):
    """L1 batch normalization over channels-last input.

    Running stats live in 'batch_stats'. Reference l1batchnorm.py:14-58.
    """
    momentum: float = 0.9
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,),
                           self.param_dtype)
        beta = self.param("beta", nn.initializers.zeros, (c,),
                          self.param_dtype)
        running_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        running_dev = self.variable(
            "batch_stats", "dev", lambda: jnp.ones((c,), jnp.float32))
        axes = tuple(range(x.ndim - 1))
        if train:
            mean = jnp.mean(x, axis=axes)
            dev = jnp.mean(jnp.abs(x - mean), axis=axes) * _SQRT_HALF_PI
            running_mean.value = (self.momentum * running_mean.value
                                  + (1 - self.momentum) * mean)
            running_dev.value = (self.momentum * running_dev.value
                                 + (1 - self.momentum) * dev)
        else:
            mean, dev = running_mean.value, running_dev.value
        xhat = (x - mean.astype(x.dtype)) / (dev.astype(x.dtype) + self.eps)
        return xhat * gamma.astype(x.dtype) + beta.astype(x.dtype)


def l1_group_norm(x: jnp.ndarray, groups: int,
                  eps: float = 1e-5) -> jnp.ndarray:
    """Functional L1 group norm. Reference l1batchnorm.py:61-82."""
    n, *spatial, c = x.shape
    xg = x.reshape((n,) + tuple(spatial) + (groups, c // groups))
    axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    dev = jnp.mean(jnp.abs(xg - mean), axis=axes,
                   keepdims=True) * _SQRT_HALF_PI
    xhat = (xg - mean) / (dev + eps)
    return xhat.reshape(x.shape)


class L1GroupNorm(nn.Module):
    """L1 group normalization. Reference l1batchnorm.py:85-121."""
    groups: int = 8
    eps: float = 1e-5
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,),
                           self.param_dtype)
        beta = self.param("beta", nn.initializers.zeros, (c,),
                          self.param_dtype)
        xhat = l1_group_norm(x, self.groups, self.eps)
        return xhat * gamma.astype(x.dtype) + beta.astype(x.dtype)
