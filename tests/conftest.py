"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding tests use XLA's host-platform device-count override so
they run anywhere (SURVEY.md §4: the "fake cluster" strategy). This must
happen before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
