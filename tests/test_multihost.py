"""Multi-host SPMD validation: two real OS processes, one global mesh.

The in-process sharding tests (test_train_and_sharding.py) exercise GSPMD
on 8 virtual devices inside ONE process; this test exercises the genuinely
multi-host concerns — jax.distributed bring-up, cross-process collectives
(gloo on the CPU backend), per-process local-batch feeding, and replicated
metric readback — by launching 2 worker processes x 4 virtual CPU devices
and checking the DP train-step loss equals the single-process value.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp_train_step_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the workers set their own XLA_FLAGS/backend; don't leak this process's
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)

    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    losses = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MHLOSS "):
                _, pid, val = line.split()
                losses[int(pid)] = float(val)
    assert sorted(losses) == [0, 1], f"missing MHLOSS lines: {outs}"

    # replicated metrics must agree exactly across processes
    assert losses[0] == losses[1], losses

    from tests.multihost_worker import single_process_loss
    expected = single_process_loss()
    np.testing.assert_allclose(losses[0], expected, rtol=1e-4)
