"""Numeric kernels (L1): native C++ host kernels + on-device JAX/Pallas
ops."""

from elektronn3_tpu.ops import native
