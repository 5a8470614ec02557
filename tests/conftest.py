"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without a pod by forcing the host
platform to expose 8 virtual devices, per the standard JAX testing recipe.

Note: this environment pre-registers a remote-TPU PJRT plugin ("axon") from a
sitecustomize hook and pins ``jax_platforms`` before conftest runs, so the
plain ``JAX_PLATFORMS=cpu`` env-var recipe does not take effect (and setting
``XLA_FLAGS`` in the process environment before interpreter start hangs the
plugin's registration).  The working order is: set XLA_FLAGS in-process,
then override the platform through ``jax.config`` before any backend is
initialized.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the suite compiles hundreds of programs
# (forced 8-device mesh, interpret-mode Pallas emulation); caching makes
# repeat runs minutes faster and sidesteps in-process XLA:CPU compiler
# flakiness on the largest interpret programs (see DESIGN.md section 8)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
