"""Mixed-Scale Dense Network (MSDNet, PNAS 2018) for 2D and 3D.

Re-design of reference elektronn3/models/msdnet.py:19-100: each layer is
one dilated conv (dilation cycling 1..10) over the concatenation of ALL
previous feature maps (width-1 dense growth); the final 1x1 conv sees
every layer plus the input.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class MSDNet(nn.Module):
    """Channels-last 2D/3D MSDNet. ``volumetric`` switches 3D/2D
    (reference msdnet.py:33-91)."""
    in_channels: int = 1
    out_channels: int = 2
    num_layers: int = 40
    volumetric: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True):
        dim = 3 if self.volumetric else 2
        k = (3,) * dim

        def conv_bn(h, out_ch, dilate, name):
            h = nn.Conv(out_ch, k, kernel_dilation=(dilate,) * dim,
                        padding="SAME", dtype=self.dtype,
                        name=f"{name}_conv")(h)
            h = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype, name=f"{name}_bn")(h)
            return h

        inp = x
        # First block (reference: add_conv_block(in_ch=in_channels))
        h = conv_bn(x, 1, 1, "first")
        h = nn.relu(h)
        prev = [h]
        feat = h
        for i in range(self.num_layers):
            s = i % 10 + 1
            h = conv_bn(feat, 1, s, f"layer_{i}")
            h = nn.relu(h)
            prev.append(h)
            feat = jnp.concatenate(prev, axis=-1)
        # Final 1x1 over all features + input
        final_in = jnp.concatenate(prev + [inp], axis=-1)
        out = nn.Conv(self.out_channels, (1,) * dim, dtype=self.dtype,
                      name="final_conv")(final_in)
        out = nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                           name="final_bn")(out)
        return out.astype(jnp.float32)
