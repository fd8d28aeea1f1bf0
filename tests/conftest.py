"""Test configuration: 8 virtual CPU devices + float64 parity policy.

The container environment registers a remote-TPU (axon) backend at
interpreter startup and forces ``jax_platforms=axon,cpu``; running the unit
suite over the tunnel costs seconds per op.  We force the CPU backend and an
8-device virtual mesh (``--xla_force_host_platform_device_count=8``) —
the same configuration the driver uses to validate multi-chip sharding.
Numerical parity tests against the reference's C++ (double) formulas
require x64.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    import numpy as np

    return np.random.default_rng(42)
