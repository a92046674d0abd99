"""Spatial sharding with halo exchange — multi-chip dense prediction.

The reference scales to large volumes by sequentially tiling on ONE
device (inference.py tiled_apply). The TPU-native scale-out: shard a
spatial axis of the volume across chips, exchange conv-halo slabs with
ring neighbors (``jax.lax.ppermute`` over ICI), run the model on each
shard + halo, and crop. This is the spatial-domain analog of sequence
parallelism / ring attention (SURVEY.md §5 "long-context" row).

Boundary semantics: edge devices receive zeros for their missing
neighbor slab (ppermute's out-of-ring default), matching the zero-pad
behavior of single-device tiled inference (inference.py:137-151).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def exchange_halo(x_local: jnp.ndarray, halo: int, spatial_axis: int,
                  axis_name: str) -> jnp.ndarray:
    """Extend a device-local shard with neighbor halo slabs.

    Must be called inside shard_map/pjit with ``axis_name`` bound.
    ``spatial_axis`` indexes into the *local* array (batch at 0).
    Returns the shard concatenated with ``halo`` slices from the left
    and right ring neighbor (zeros at the ring ends).
    """
    n = jax.lax.axis_size(axis_name)
    # Slab we send right = our last `halo` slices; received from left.
    send_right = jax.lax.slice_in_dim(
        x_local, x_local.shape[spatial_axis] - halo,
        x_local.shape[spatial_axis], axis=spatial_axis)
    # Slab we send left = our first `halo` slices; received from right.
    send_left = jax.lax.slice_in_dim(x_local, 0, halo, axis=spatial_axis)
    from_left = jax.lax.ppermute(
        send_right, axis_name, [(i, i + 1) for i in range(n - 1)])
    from_right = jax.lax.ppermute(
        send_left, axis_name, [(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([from_left, x_local, from_right],
                           axis=spatial_axis)


def sharded_spatial_apply(
        apply_fn: Callable[[jnp.ndarray], jnp.ndarray],
        mesh: Mesh,
        halo: int,
        spatial_axis: int = 1,
        axis_name: str = "space",
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Build a multi-chip dense-prediction function.

    ``apply_fn`` maps a channels-last array to a same-spatial-shape
    array (same-conv model). The returned function takes the FULL input,
    shards ``spatial_axis`` over ``axis_name``, exchanges ``halo`` slabs
    between ring neighbors, applies the model per shard, crops the halo
    and reassembles the full output.

    The per-shard spatial extent must be divisible by the model's
    pooling product; ``halo`` should cover the receptive-field half
    width.
    """
    ndim_hint = None  # specs built per-call from input rank

    def specs_for(ndim: int):
        spec = [None] * ndim
        spec[spatial_axis] = axis_name
        return P(*spec)

    def full_apply(x: jnp.ndarray) -> jnp.ndarray:
        spec = specs_for(x.ndim)

        @partial(shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec,
                 check_vma=False)
        def run(x_local):
            x_ext = exchange_halo(x_local, halo, spatial_axis, axis_name)
            y = apply_fn(x_ext)
            return jax.lax.slice_in_dim(
                y, halo, y.shape[spatial_axis] - halo, axis=spatial_axis)

        return run(x)

    return full_apply
