"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The container forces JAX_PLATFORMS=axon (real TPU via relay) through a
sitecustomize hook; tests must run on CPU with 8 virtual devices so sharding
paths are exercised without hardware (SURVEY §4:
--xla_force_host_platform_device_count). The platform is switched in-process
before any backend is used. Benchmarks (bench.py) still run on the real TPU.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(seed=1234)
