"""Test configuration: run all tests on CPU with 8 virtual devices.

Multi-chip hardware is not available in CI; sharding correctness is tested
on a virtual 8-device CPU mesh exactly as the driver's ``dryrun_multichip``
does (see repo __graft_entry__.py).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
