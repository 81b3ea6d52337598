"""Driver-contract checks for __graft_entry__.

dryrun_multichip must be SELF-CONTAINED: the driver calls it in an
environment whose JAX is already pinned to a single real TPU device, so the
function itself must arrange the virtual n-device CPU backend (it re-execs
a subprocess with JAX_PLATFORMS=cpu + --xla_force_host_platform_device_count).
This test invokes it from a clean interpreter WITHOUT the conftest's forced
8-device CPU env, mimicking the driver environment.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_self_contained():
    env = {k: v for k, v in os.environ.items()
           if k not in ("_A8T_DRYRUN_CHILD", "XLA_FLAGS", "JAX_PLATFORMS")}
    r = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
