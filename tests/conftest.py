"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths are exercised without TPU hardware.

Note: this host's sitecustomize pre-imports jax and pins JAX_PLATFORMS to the
TPU plugin, so plain env vars are too late — we must go through jax.config.
XLA_FLAGS is still read lazily at first backend initialization, so setting it
here (before any jax computation) works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity tests compare against float32 PyTorch; keep MXU-style bf16 out of tests.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
    assert jax.device_count() == 8, f"expected 8 virtual devices, got {jax.device_count()}"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
