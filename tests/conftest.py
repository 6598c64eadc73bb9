"""Test harness: force an 8-device virtual CPU mesh.

The container boots with JAX_PLATFORMS=axon (a single tunneled TPU chip,
slow remote compiles); tests instead exercise multi-device sharding on
host CPU devices. `import pytest` already pulls in jax via a plugin, so
env vars alone are too late — but backends initialize lazily, so
`jax.config.update` before the first `jax.devices()` call still wins.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
