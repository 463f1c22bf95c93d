"""Test configuration: force an 8-device virtual CPU mesh.

Tests must run identically with or without TPU hardware, and the sharding
tests need multiple devices. The environment's sitecustomize may register a
TPU plugin and override JAX_PLATFORMS via jax.config, so we override it
back AFTER importing jax (before any backend is initialized).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# BTLE_TPU_TEST_BACKEND=tpu runs the suite against attached hardware
# (slow over the remote-compile tunnel; used for hardware spot checks)
if os.environ.get("BTLE_TPU_TEST_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


REFERENCE_DIR = "/root/reference"


def reference_path(*parts):
    return os.path.join(REFERENCE_DIR, *parts)
