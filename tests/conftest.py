"""Test configuration: force CPU JAX with 8 virtual devices so all sharding
logic is exercised without a pod (SURVEY.md §4 item 4).

jax may already be *imported* by pytest plugins before this file runs, but
the backend is not yet initialised, so jax.config.update still works; the
env vars cover subprocess tests.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
