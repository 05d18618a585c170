"""Test harness config: force an 8-device virtual CPU mesh.

Tests never require TPU hardware; multi-chip sharding is validated on a
virtual CPU mesh exactly as the driver's ``dryrun_multichip`` does.

Note: this image registers an 'axon' TPU PJRT plugin from sitecustomize
*before* any user code runs, so setting JAX_PLATFORMS in os.environ here is
too late — we must go through jax.config after import instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (multi-process, many compiles)"
    )
