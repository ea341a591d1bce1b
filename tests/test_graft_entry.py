"""Driver-contract regression tests for __graft_entry__.

The driver imports this module and calls `dryrun_multichip(8)` in-process
with NO environment preparation — typically after jax has already
initialised a 1-device backend. Round 1 failed exactly there
(MULTICHIP_r01.json ok=false); these tests pin the fix.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_inline_on_virtual_mesh():
    """With the conftest's 8-device CPU mesh already up, the dryrun runs
    inline (no subprocess) and passes."""
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    g.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_self_bootstraps_from_initialized_small_backend():
    """The driver's calling convention: fresh process, jax backend already
    initialised with a single device, no XLA_FLAGS — dryrun_multichip(8)
    must still pass by re-execing itself with a prepared environment."""
    env = {
        k: v
        for k, v in os.environ.items()
        if "host_platform_device_count" not in v or k != "XLA_FLAGS"
    }
    env.pop("XLA_FLAGS", None)
    env.pop("_REGENNET_DRYRUN_CHILD", None)
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('BOOTSTRAP_OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "BOOTSTRAP_OK" in proc.stdout
    assert "dryrun_multichip OK" in proc.stdout
