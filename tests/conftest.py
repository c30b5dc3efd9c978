"""Test configuration: run all tests on CPU with 8 virtual devices.

Multi-chip hardware is not available in CI; sharding correctness is tested
on a virtual 8-device CPU mesh exactly as the driver's ``dryrun_multichip``
does (see repo __graft_entry__.py).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# Force CPU: the ambient environment may set JAX_PLATFORMS=axon (remote TPU
# tunnel), which the plugin re-registers even over the env var — every eager
# op would go over the network.  jax.config wins over the plugin.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_threefry_partitionable", True)
# float64 available in tests for tight conservation checks; production arrays
# are constructed explicitly as float32.
jax.config.update("jax_enable_x64", True)
