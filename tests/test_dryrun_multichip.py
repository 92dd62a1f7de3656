"""CI gate for the driver's multi-chip dryrun: every production sharding
recipe (DP train, DP/TP/TP-4 inference, hybrid CFG-data x model) must
compile AND execute on the virtual 8-device mesh with ZERO SPMD partitioner
fallbacks — dryrun_multichip itself tees XLA's stderr and asserts that, so
a sharding regression fails here instead of shipping as a silent slowdown
in MULTICHIP_r{N}.json."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_clean():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"),
         "multichip", "8"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1200)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "SPMD check: involuntary rematerializations=0" in proc.stdout, \
        proc.stdout[-3000:]
    for recipe in ("train", "inference DP", "inference TP",
                   "TP model=4", "hybrid CFG-data x model",
                   "production 512^2 sharded compile"):
        assert f"OK ({recipe})" in proc.stdout or \
            f"OK (inference {recipe})" in proc.stdout, (recipe,
                                                        proc.stdout[-3000:])
