"""EvoNorm B0 / S0 normalization-activation layers (arXiv:2004.02967).

Reference: elektronn3/modules/evonorm.py:8-101 (2D and 3D variants).
Channels-last: works for any spatial rank, so one module covers both.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def instance_std(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-(sample, channel) std over spatial dims. Reference
    evonorm.py:8-16."""
    spatial = tuple(range(1, x.ndim - 1))
    var = jnp.var(x, axis=spatial, keepdims=True)
    return jnp.sqrt(var + eps)


def group_std(x: jnp.ndarray, groups: int = 32,
              eps: float = 1e-5) -> jnp.ndarray:
    """Per-(sample, group) std over spatial dims + within-group channels.
    Reference evonorm.py:19-30."""
    n, *spatial, c = x.shape
    groups = min(groups, c)
    xg = x.reshape((n,) + tuple(spatial) + (groups, c // groups))
    axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
    var = jnp.var(xg, axis=axes, keepdims=True)
    std = jnp.sqrt(var + eps)
    return jnp.broadcast_to(std, xg.shape).reshape(x.shape)


class EvoNorm(nn.Module):
    """EvoNorm layer; ``version`` in {'B0', 'S0'}.

    - S0: ``x * sigmoid(v * x) / group_std(x)`` (sample-based, no running
      stats).
    - B0: ``x / max(sqrt(running_var + eps), v*x + instance_std(x))``
      (batch-based, keeps running variance in the 'batch_stats'
      collection).

    Reference: evonorm.py:33-101.
    """
    version: str = "S0"
    momentum: float = 0.9
    eps: float = 1e-5
    groups: int = 32
    non_linear: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        c = x.shape[-1]
        shape = (1,) * (x.ndim - 1) + (c,)
        gamma = self.param("gamma", nn.initializers.ones, shape,
                           self.param_dtype)
        beta = self.param("beta", nn.initializers.zeros, shape,
                          self.param_dtype)
        if self.version == "S0":
            if self.non_linear:
                v = self.param("v", nn.initializers.ones, shape,
                               self.param_dtype)
                num = x * nn.sigmoid(v * x)
                x = num / group_std(x, self.groups, self.eps)
            return x * gamma + beta
        if self.version == "B0":
            running_var = self.variable(
                "batch_stats", "running_var",
                lambda: jnp.ones(shape, jnp.float32))
            if train:
                axes = (0,) + tuple(range(1, x.ndim - 1))
                var = jnp.var(x, axis=axes, keepdims=True)
                running_var.value = (self.momentum * running_var.value
                                     + (1 - self.momentum) * var)
            else:
                var = running_var.value
            if self.non_linear:
                v = self.param("v", nn.initializers.ones, shape,
                               self.param_dtype)
                den = jnp.maximum(jnp.sqrt(var + self.eps),
                                  v * x + instance_std(x, self.eps))
                x = x / den
            else:
                x = x / jnp.sqrt(var + self.eps)
            return x * gamma + beta
        raise ValueError(f"Unknown EvoNorm version {self.version!r}")
