"""Test harness setup.

Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
logic is exercised without a pod (SURVEY.md section 4.5). The environment's
axon TPU plugin force-registers itself and overrides JAX_PLATFORMS, so the
platform must be pinned via jax.config *after* importing jax but before any
backend initialization. This also keeps XLA compiles local (the axon
backend compiles remotely, seconds per shape).
"""

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import ndpp_tpu  # noqa: F401,E402  (enables jax x64 + compile cache)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)
