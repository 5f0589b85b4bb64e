"""Test configuration: run everything on CPU with 8 virtual devices so the
sharded (pjit) paths are exercised without TPU hardware.

Note: this environment registers an 'axon' TPU backend via sitecustomize and
pins ``jax_platforms`` programmatically, so the JAX_PLATFORMS env var alone is
not enough — we must override through jax.config after import.
"""

import os

# Must be set before the jax backend initializes for the virtual device count.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
