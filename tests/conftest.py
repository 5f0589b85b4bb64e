"""Test configuration: run everything on CPU with 8 virtual devices so the
sharded (pjit) paths are exercised without TPU hardware.

Note: this environment registers an 'axon' TPU backend via sitecustomize and
pins ``jax_platforms`` programmatically, so the JAX_PLATFORMS env var alone is
not enough — we must override through jax.config after import.
"""

import os

# TESTS_ON_TPU=1 runs the suite on the real chip (for the TPU-only kernel
# tests, e.g. in-kernel dropout whose PRNG yields zeros in interpret mode).
if os.environ.get("TESTS_ON_TPU") != "1":
    # Must be set before the jax backend initializes for the device count.
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if os.environ.get("TESTS_ON_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
