"""Test configuration: force a virtual 8-device CPU backend before jax use.

Mirrors the multi-device test strategy recommended for TPU code: shardings and
collectives are validated on `--xla_force_host_platform_device_count=8` CPU
devices, and the same code paths run unchanged on a real TPU mesh.

Note: this environment pre-registers a TPU backend via sitecustomize and
ignores the JAX_PLATFORMS env var, so we override through jax.config (which
wins over both).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
