import os

# Force CPU with 8 virtual devices for sharding tests. Note: the axon TPU
# plugin in this environment overrides the JAX_PLATFORMS env var, so we must
# use jax.config.update before any backend is initialized.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
