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


def pytest_collection_modifyitems(session, config, items):
    """Run the sharded-sampler module FIRST.

    jaxlib 0.9.0's CPU compiler segfaults (reproducibly, in
    backend_compile_and_load) when the suite's largest program — the
    shard_map'd python-unrolled warmup chunk of
    test_sharded.py::TestShardedChunked — is compiled after ~240 tests of
    accumulated compiler state; the same test passes in a fresh process.
    Compiling the biggest programs first sidesteps the crash without
    changing any test."""
    front = [it for it in items if "test_sharded" in it.nodeid]
    rest = [it for it in items if "test_sharded" not in it.nodeid]
    items[:] = front + rest


_last_module = [None]


@pytest.fixture(autouse=True)
def _clear_jax_caches_between_modules(request):
    """Drop compiled executables at module boundaries.

    Round 4: the jaxlib-0.9.0 CPU segfault (same
    ``backend_compile_and_load`` signature as the round-2 one) came back
    with the suite's growth, and the crash point MOVES between runs —
    heap-state-dependent accumulation, not one test.  Freeing the
    executable caches per module keeps the live compiler state bounded;
    the persistent on-disk compilation cache (below) keeps repeated
    shapes cheap to re-load."""
    mod = request.node.nodeid.split("::", 1)[0]
    if _last_module[0] is not None and _last_module[0] != mod:
        jax.clear_caches()
    _last_module[0] = mod
    yield


try:
    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/gpr_tpu_test_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except (AttributeError, ValueError):
    pass
