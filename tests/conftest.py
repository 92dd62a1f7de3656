import os

# Force CPU with 8 virtual devices for sharding tests. Note: the axon TPU
# plugin in this environment overrides the JAX_PLATFORMS env var, so we must
# use jax.config.update before any backend is initialized.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# The XLA:CPU AOT cache loader logs a spurious machine-feature-mismatch
# error per cache hit (it compares compile tuning flags like
# prefer-no-scatter as if they were ISA features) — hundreds of lines per
# test process. Suppress C++ logs in tests; Python-level jax warnings are
# unaffected.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: eager init of even tiny models costs ~25-30 s
# of cold compiles of hundreds of small RNG/elementwise programs PER PROCESS
# (measured; the single biggest smoke-tier line item). The cache brings the
# second process to ~2 s. Machine-local (/tmp), shared across test runs.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_TEST_CACHE_DIR", "/tmp/jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
