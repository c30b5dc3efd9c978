"""Test configuration: run all tests on CPU with 8 virtual devices.

Multi-chip hardware is not available in CI; sharding correctness is tested
on a virtual 8-device CPU mesh exactly as the driver's ``dryrun_multichip``
does (see repo __graft_entry__.py).

Set ``TNL_TPU_TESTS=1`` to keep the real TPU backend instead - only the
hardware smoke tests (tests/test_tpu_smoke.py) run there; everything else
skips itself on non-CPU backends where behavior would differ.
"""

import os

import pytest

TPU_MODE = os.environ.get("TNL_TPU_TESTS") == "1"

if not TPU_MODE:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

if not TPU_MODE:
    # Force CPU: the ambient environment may set JAX_PLATFORMS=axon (remote
    # TPU tunnel), which the plugin re-registers even over the env var —
    # every eager op would go over the network.  jax.config wins over the
    # plugin.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    # CPU test runs are compile-dominated on the 1-core CI box; most XLA
    # optimization passes only shave runtime we never recoup.  Measured:
    # ~26% wall off compile-heavy tests, identical pass/fail behavior
    # (both sides of every equality test run under the same flag).
    jax.config.update("jax_disable_most_optimizations", True)
    # Persistent compile cache: dedups identical XLA programs across tests
    # (parametrized variants re-jit the same reference step) and across
    # runs on the same box.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.expanduser("~"), ".cache",
                                   "jax_tnl_tests"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

jax.config.update("jax_threefry_partitionable", True)


def pytest_collection_modifyitems(config, items):
    if not TPU_MODE:
        return
    skip = pytest.mark.skip(reason="TNL_TPU_TESTS=1: only tpu_smoke tests run on hardware")
    for item in items:
        if "tpu_smoke" not in item.nodeid:
            item.add_marker(skip)
