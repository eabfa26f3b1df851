"""Test env: force an 8-device virtual CPU mesh so multi-chip sharding logic
runs without a pod, and so Pallas kernels exercise interpret mode.

NOTE: this environment's axon TPU plugin overrides the ``JAX_PLATFORMS``
env var, so the only reliable way to force CPU is ``jax.config.update``
immediately after import — before any backend is initialized by a test.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
