"""Tracing, profiling, and structured metrics.

The reference's only observability is a tqdm bar + optional torch.compile
markers (SURVEY.md §5). Here:
  * trace(): context manager around jax.profiler (TensorBoard-readable)
  * StepTimer: per-phase wall-clock timing with host-sync, img/s counters
  * log_event(): structured JSON-lines logging
"""

from __future__ import annotations

import contextlib
import json
import logging
import sys
import time
from typing import Dict, Optional

import jax

logger = logging.getLogger("blobctrl_tpu")
if not logger.handlers:
    _h = logging.StreamHandler(sys.stderr)
    _h.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)


def log_event(event: str, **fields):
    logger.info(json.dumps({"event": event, **fields}))


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/blobctrl_trace"):
    """jax.profiler trace (open with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        log_event("trace_written", dir=log_dir)


@contextlib.contextmanager
def annotate(name: str):
    """Named region in profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


def profile_op_breakdown(fn, *args, repeats: int = 3,
                         log_dir: str = "/tmp/blobctrl_trace",
                         top_k: int = 20) -> Dict[str, float]:
    """Run `fn(*args)` under the profiler and return {op_name: ms_per_call}
    bucketed from the TPU device timeline — the xplane trace parser that
    works through the axon tunnel (where per-op timing via block_until_ready
    does not)."""
    import collections
    import glob
    import gzip
    import json

    out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.start_trace(log_dir)
    try:
        for _ in range(repeats):
            out = fn(*args)
        jax.block_until_ready(out)
        time.sleep(0.3)
    finally:
        jax.profiler.stop_trace()

    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return {}
    with gzip.open(paths[-1], "rt") as fh:
        trace = json.load(fh)
    pids = {p["pid"]: p.get("args", {}).get("name", "")
            for p in trace["traceEvents"]
            if p.get("ph") == "M" and p.get("name") == "process_name"}
    buckets: Dict[str, float] = collections.Counter()
    for e in trace["traceEvents"]:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "TPU" not in pids.get(e["pid"], ""):
            continue
        name = e.get("name", "")
        if name.startswith("jit"):
            continue  # top-level envelope double-counts children
        buckets[name.split(".")[0].split("(")[0][:48]] += e["dur"]
    result = {k: round(v / repeats / 1000, 4)
              for k, v in sorted(buckets.items(), key=lambda kv: -kv[1])[:top_k]}
    log_event("op_breakdown", **result)
    return result


class StepTimer:
    """Wall-clock phase timing with device sync; accumulates per-phase stats."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": round(v, 4),
                    "mean_s": round(v / max(self.counts[k], 1), 4),
                    "count": self.counts[k]}
                for k, v in self.totals.items()}

    def report(self):
        log_event("step_timer", **{k: v["mean_s"] for k, v in self.summary().items()})
