"""CI gate for the PRODUCTION-geometry sharded compile (VERDICT r4 Next #1):
the real 512^2 SD-1.5+BlobNet 50-step edit graph — not the tiny dryrun
configs — must compile SPMD-clean through both sharding recipes on the
virtual mesh, and the audit must find the expected collective structure in
the denoise while-body (a spec regression that reshards activations per
step shows up here as a payload explosion).

Reference counterpart: the hot loop being parallelized,
/root/reference/blobctrl/pipelines/pipeline_blobnet.py:1024-1123.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.parametrize("recipe", ["tp", "hybrid"])
def test_production_geometry_sharded_compile(recipe, tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = str(tmp_path / "audit.json")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/compile_audit_run.py"),
         "--recipes", recipe, "--json_out", out],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1200)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    # production-shape SPMD pathologies the toy dryrun cannot see
    assert "Involuntary full rematerialization" not in proc.stderr, \
        proc.stderr[-3000:]

    with open(out) as f:
        rep = json.load(f)[recipe]
    assert rep["size"] == 512 and rep["num_steps"] == 50
    body = rep["while_body"]
    # the denoise loop was found and is genuinely sharded: Megatron pairing
    # puts all-reduces (row-parallel combines) inside the body
    assert body["computation"], rep["collectives_total"]
    assert body["ops"].get("all-reduce", {}).get("count", 0) > 0, body
    # payload regression guard: measured 3.77/2.11 GB/step (f32 CPU HLO,
    # post-audit specs, PERF_NOTES "Production-geometry compile audit");
    # alert at +25% before it ships as a silent multi-chip slowdown
    cap = {"tp": 4.8e9, "hybrid": 2.7e9}[recipe]
    assert body["bytes"] < cap, (body["bytes"], cap)
    assert rep["memory_analysis"].get("temp_size_in_bytes", 0) > 0
