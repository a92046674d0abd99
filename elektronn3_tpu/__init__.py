"""elektronn3_tpu — a TPU-native framework for training and deploying
2D/3D convolutional neural networks for dense prediction (semantic
segmentation) on volumetric biomedical image data.

Built from scratch on JAX/XLA/Pallas with the capabilities of
ELEKTRONN/elektronn3 (see /root/reference), redesigned TPU-first:

- NDHWC (channels-last) tensor layout so XLA:TPU tiles convolutions onto
  the MXU without transposes.
- bfloat16 compute / float32 params mixed precision (no loss scaling).
- jit-compiled, buffer-donated train and inference steps.
- Multi-chip scaling via ``jax.sharding.Mesh`` + compiler-inserted
  collectives (data-parallel batch sharding, spatial halo sharding).
- On-device fused warp-augmentation pipeline instead of host-side Numba.

Subpackages (mirroring the reference's five-package structure,
reference elektronn3/__init__.py / README.md:9-13):

- ``elektronn3_tpu.training``: training loop, metrics, checkpointing
- ``elektronn3_tpu.data``: datasets, augmentation, warping, HDF5 I/O
- ``elektronn3_tpu.inference``: tiled deployment / prediction
- ``elektronn3_tpu.models``: model zoo (UNet flagship)
- ``elektronn3_tpu.modules``: NN building blocks and losses
- ``elektronn3_tpu.ops``: numeric kernels (Pallas / XLA)
- ``elektronn3_tpu.parallel``: device meshes, sharding, halo exchange
"""

import numpy as np

from elektronn3_tpu.logger import logger

# Default float dtype for host-side (numpy) data processing.
# Reference parity: elektronn3/__init__.py:12 (floatX = np.float32).
floatX = np.float32

__all__ = ["floatX", "logger"]
__version__ = "0.1.0"


def select_mpl_backend():  # pragma: no cover - environment dependent
    """Select a working matplotlib backend (Agg when no display).

    Reference parity: elektronn3/__init__.py:15-44.
    """
    import os
    import matplotlib
    if not os.environ.get("DISPLAY"):
        matplotlib.use("Agg")
