"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without a pod by forcing the host
platform to expose 8 virtual devices, per the standard JAX testing recipe.
Environment variables must be set before jax is first imported.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
