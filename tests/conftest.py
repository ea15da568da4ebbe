"""Test configuration: force an 8-virtual-device CPU platform.

Tests never touch the real TPU; multi-chip sharding is validated on a virtual
CPU mesh (xla_force_host_platform_device_count), mirroring how the driver
dry-runs the multichip path.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's sitecustomize registers the 'axon' TPU plugin and pins
# jax_platforms before user code runs; force the virtual-CPU platform here
# (before any backend initialization) so tests never touch the real chip.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    # ADALOG_TEST_SEED: seed-sweep fuzzing of the differential suite (the
    # parity argument strengthens with every seed that agrees with the
    # reference); default 0 keeps CI deterministic
    import os
    return np.random.default_rng(int(os.environ.get("ADALOG_TEST_SEED", "0")))
