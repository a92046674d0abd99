"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding tests use jax's CPU device-count override so they
run anywhere (SURVEY.md §4: the "fake cluster" strategy). This must
happen before jax is imported anywhere.

Environment notes (this image):
- A sitecustomize registers the remote 'axon' TPU platform whenever
  PALLAS_AXON_POOL_IPS is set; clearing it + JAX_PLATFORMS=cpu gives a
  real local CPU backend.
- jax 0.9 ignores --xla_force_host_platform_device_count; the supported
  knob is the 'jax_num_cpu_devices' config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_backend_optimization_level" not in flags:
    # The CI box may have a single CPU core; skip expensive XLA
    # optimization passes to keep compile times tolerable.
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags.strip()

import jax

# The axon sitecustomize runs at interpreter startup and rewrites
# jax_platforms to "axon,cpu"; force it back before backend init.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
