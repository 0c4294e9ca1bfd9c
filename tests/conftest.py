"""Test harness: run everything on a virtual 8-device CPU mesh.

The reference has no test suite (SURVEY.md §4); multi-device correctness was
delegated to HF Accelerate.  Here every test runs on CPU with 8 fake devices
so sharding/collective code paths are exercised without TPU hardware.
"""

import os
import sys

# Must be set before the backend initialises.  The axon sitecustomize imports
# jax at interpreter start, so plain env vars are latched too early — force
# the platform through jax.config instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
