"""Test config: force the CPU backend with 8 virtual devices so multi-chip sharding
tests run without TPU hardware.

Note: this environment pre-sets JAX_PLATFORMS=axon and the plugin wins over the env
var, so we must force the platform through jax.config before any backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
