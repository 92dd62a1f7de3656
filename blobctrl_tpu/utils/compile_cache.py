"""Persistent XLA compilation cache for the app entry points.

Cold compiles dominate process startup: ~20-40 s for the 50-step edit graph
on TPU, ~280 s for the 512^2 production training step. The persistent cache
repays them on every subsequent CLI/server/trainer start on the same
machine (measured in tests/conftest.py, where the same mechanism cut the
smoke tier from ~2 min to ~50 s).

Opt out with BLOBCTRL_NO_COMPILE_CACHE=1; relocate with
BLOBCTRL_CACHE_DIR. Libraries embedding blobctrl_tpu keep full control by
simply not calling this (only the apps/ entry points do).
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Idempotent; safe to call before or after backend init (the cache
    config is read at compile time). Returns the cache dir or None."""
    if os.environ.get("BLOBCTRL_NO_COMPILE_CACHE") == "1":
        return None
    import jax
    path = path or os.environ.get(
        "BLOBCTRL_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "blobctrl_tpu",
                     "xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # only cache compiles worth the disk round-trip
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
