"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is unavailable in CI; all sharding/collective tests
run on 8 virtual CPU devices, which exercises the same SPMD partitioning
paths XLA uses on a real TPU slice.
"""

import os
import sys

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU plugin and re-exports
# JAX_PLATFORMS=axon at interpreter start; jax.config wins over the env var.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

