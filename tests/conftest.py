"""Test env: force an 8-device virtual CPU platform before jax imports.

Multi-chip sharding tests run against this virtual mesh (the reference has
no distributed tests at all — see SURVEY.md §4; we add them).
"""

import os

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# This machine pins JAX_PLATFORMS=axon (remote TPU tunnel); the env var is
# ignored, so force the platform through the config API. Without this,
# "CPU" tests dispatch op-by-op over the tunnel (~30ms RTT per op).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# this jax build defaults fp32 matmuls/convs to bf16 passes (TPU-style);
# parity tests need true fp32
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.RandomState(0)
