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


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: node IDs in tests/slow_manifest.txt (>= 5s call time
    in the last full run) get `slow`; everything else gets `fast`, so
    `pytest -m fast` (~3.5 min) is the default iteration loop and
    `pytest -m slow` / plain `pytest` cover the rest. Regenerate the
    manifest with scripts/update_slow_manifest.py after big suite changes.
    New tests default to fast until the manifest is refreshed."""
    import pytest

    manifest = os.path.join(os.path.dirname(__file__), "slow_manifest.txt")
    slow_ids = set()
    if os.path.exists(manifest):
        with open(manifest) as f:
            slow_ids = {
                ln.strip() for ln in f
                if ln.strip() and not ln.startswith("#")
            }
    for item in items:
        nodeid = item.nodeid.replace(os.sep, "/")
        if nodeid in slow_ids:
            item.add_marker(pytest.mark.slow)
        elif not any(m.name == "slow" for m in item.iter_markers()):
            item.add_marker(pytest.mark.fast)
