"""Device mesh construction helpers.

The reference's only multi-device path is single-process
``nn.DataParallel`` (SURVEY.md §2.2). The TPU-native replacement is a
``jax.sharding.Mesh`` + compiler-inserted collectives:
- 'data' axis: batch sharding (data parallelism); gradient psum rides
  ICI automatically under jit.
- 'space' axis: spatial sharding of the D/H/W volume with explicit halo
  exchange (see elektronn3_tpu.parallel.halo) — the spatial analog of
  sequence parallelism.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(axes: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh from an axis-name → size dict.

    ``make_mesh({'data': 4, 'space': 2})`` on 8 devices. With
    ``axes=None``, all devices go on a single 'data' axis.
    """
    if devices is None:
        devices = jax.devices()
    if axes is None:
        axes = {"data": len(devices)}
    shape = tuple(axes.values())
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(
            f"Mesh shape {axes} needs {n} devices, have {len(devices)}")
    dev_array = np.array(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axes.keys()))


def data_parallel_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return make_mesh({"data": len(devices)}, devices)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) dim over ``axis``."""
    return NamedSharding(mesh, PartitionSpec(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
