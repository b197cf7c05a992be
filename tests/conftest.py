"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding
(mesh/pjit/shard_map/halo-exchange) is exercised without TPU hardware —
the standard JAX substitute for a fake distributed backend
(SURVEY.md §4).  The env vars must be set before jax is imported.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The interpreter may have pre-registered a TPU backend via sitecustomize
# with JAX_PLATFORMS baked in; override through the live config as well.
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
