"""Test env: force an 8-device virtual CPU platform before jax imports.

Multi-chip sharding tests run against this virtual mesh (the reference has
no distributed tests at all — see SURVEY.md §4; we add them).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# this jax build defaults fp32 matmuls/convs to bf16 passes (TPU-style);
# parity tests need true fp32
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.RandomState(0)
