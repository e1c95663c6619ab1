"""Test harness: force an 8-device virtual CPU platform.

This image preloads JAX via sitecustomize with a tunneled TPU backend
(JAX_PLATFORMS=axon), so setting env vars here is too late — use
jax.config.update before any backend is touched. Multi-chip sharding is
validated on a virtual 8-device CPU mesh (xla_force_host_platform_device_count),
the JAX-native answer to testing multi-node layouts without a cluster.
Benchmarks (bench.py) run on the real TPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update(
    "jax_platforms", os.environ.get("LSQ_TPU_TEST_PLATFORM", "cpu")
)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
