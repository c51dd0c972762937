"""Test configuration: CPU backend, 8 virtual devices, x64 golden precision.

Multi-device sharding tests follow SURVEY.md §4's recommendation: fake-device
CPU meshes via xla_force_host_platform_device_count, so halo-exchange and
shard_map logic is testable without a TPU.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
