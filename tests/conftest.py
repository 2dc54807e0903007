"""Test configuration: force CPU JAX with 8 virtual devices so all sharding
logic is exercised without a pod (SURVEY.md §4 item 4). Must run before any
jax import."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
