"""Test configuration: run on a simulated 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell env may point at a TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize imports jax before this file runs, so env vars
# alone are too late; reconfigure before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU backend"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
