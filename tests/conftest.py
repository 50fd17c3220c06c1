"""Test harness setup.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
logic is exercised without a pod (SURVEY.md section 4.5). Env vars must be
set before jax initializes its backends — conftest import time is early
enough because no test module has imported jax yet.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest

import ndpp_tpu  # noqa: F401  (enables jax x64)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)
