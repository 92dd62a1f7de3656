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
