"""Flax wrapper for the Pallas fused BatchNorm kernels.

Drop-in alternative to ``nn.BatchNorm`` for channels-last activations:
select with ``normalization='batchp'`` in the model configs. Keeps
running statistics in the 'batch_stats' collection with the same
momentum semantics as the flax layer.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from elektronn3_tpu.ops.pallas_bn import (
    batch_norm_inference,
    batch_norm_train,
)

Dtype = Any


class PallasBatchNorm(nn.Module):
    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        if use_running_average is None:
            use_running_average = self.use_running_average
        C = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (C,),
                           self.param_dtype)
        beta = self.param("bias", nn.initializers.zeros, (C,),
                          self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        if use_running_average:
            return batch_norm_inference(
                x, gamma, beta, ra_mean.value, ra_var.value, self.epsilon)
        y, mean, var = batch_norm_train(x, gamma, beta, self.epsilon)
        if not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1 - self.momentum) * var)
        return y
