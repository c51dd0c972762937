"""Test configuration: CPU backend, 8 virtual devices, x64 golden precision.

Multi-device sharding tests follow SURVEY.md §4's recommendation: fake-device
CPU meshes via xla_force_host_platform_device_count, so halo-exchange and
shard_map logic is testable without a TPU.

Note: this image's sitecustomize imports jax at interpreter start (axon TPU
plugin), so JAX_PLATFORMS env juggling is too late — we switch the platform
through jax.config before any backend is initialized instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# force CPU: golden tests need x64 (TPU has no C128) and virtual devices
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
