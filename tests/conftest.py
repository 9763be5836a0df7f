"""Test env: force the CPU backend with 8 fake devices.

SURVEY.md section 4: multi-device paths are tested without a cluster via
``--xla_force_host_platform_device_count=8``; all unit math runs on CPU (the
driver's config 1 is explicitly CPU-runnable). Must run before jax imports.
"""

import os

# Force CPU even when the launch environment preselects a TPU platform
# (the single-chip axon tunnel): unit tests must be hermetic and fast.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers the experimental 'axon' TPU
# platform and overrides JAX_PLATFORMS, so pin the platform via config too
# (must happen before any backend is initialized).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def tiny_params():
    """Deterministic random VGG-19 fixture weights (session-cached)."""
    from style_transfer_tpu.models.weights import random_fixture

    params, mean, std = random_fixture(0)
    return params, mean, std
