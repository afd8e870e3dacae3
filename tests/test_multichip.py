"""Multi-device sharding: run the driver's dryrun_multichip contract on
an 8-virtual-device CPU mesh, in a subprocess (the device-count flag
must be set before JAX initializes, and it slows XLA enough that we
keep it out of the main test process)."""
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo
    code = (
        "import jax\n"
        "assert len(jax.devices()) == 8, jax.devices()\n"
        "from __graft_entry__ import dryrun_multichip\n"
        "dryrun_multichip(8)\n"
    )
    r = subprocess.run([sys.executable, "-c", code], cwd=repo, env=env,
                       capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "dryrun_multichip(8)" in r.stdout
