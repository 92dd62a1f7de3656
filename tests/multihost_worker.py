"""Cross-process SPMD worker for tests/test_multihost.py.

Run as ``python tests/multihost_worker.py <process_id> <num_processes>
<coordinator_port>``. Each OS process brings up 4 virtual CPU devices,
joins the gloo-backed distributed runtime, and runs ONE data-parallel
train step of the tiny BlobCtrl setup over the 8-device global mesh —
feeding only its own rows of the global batch — then prints the loss as
``MHLOSS <pid> <loss>``. The pytest side launches two of these and checks
both agree with the single-process loss of the same global batch.

The model/batch construction mirrors
tests/test_train_and_sharding.py::test_train_step_dp_sharded_matches_single_device
so the multi-host result is comparable against an already-trusted oracle.
"""

import os
import sys

GLOBAL_BATCH = 8
LOCAL_DEVICES = 4


def _common_setup():
    """Deterministic tiny-train setup, identical in every process."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from blobctrl_tpu.apps import flagship
    from blobctrl_tpu.models import blobnet as blobnet_lib
    from blobctrl_tpu.models import lora as lora_lib
    from blobctrl_tpu.models import unet as unet_lib
    from blobctrl_tpu.train import train_step as ts

    unet_cfg, blobnet_cfg = flagship.tiny_configs()
    key = jax.random.PRNGKey(0)
    unet_params = unet_lib.init_unet(key, unet_cfg)
    blobnet_params = blobnet_lib.init_blobnet(key, blobnet_cfg)
    lora_params = lora_lib.init_lora(key, unet_params, rank=4)
    cfg = ts.TrainConfig(compute_dtype=jnp.float32, remat=False)
    step_fn = ts.make_train_step(cfg, unet_cfg, blobnet_cfg)

    rng = np.random.RandomState(1)
    batch = {
        "x0_latents": rng.randn(GLOBAL_BATCH, 8, 8, 4).astype(np.float32),
        "fg_latents": rng.randn(GLOBAL_BATCH, 8, 8, 4).astype(np.float32),
        "bg_latents": rng.randn(GLOBAL_BATCH, 8, 8, 4).astype(np.float32),
        "fg_score": rng.rand(GLOBAL_BATCH, 8, 8, 1).astype(np.float32),
        "bg_score": rng.rand(GLOBAL_BATCH, 8, 8, 1).astype(np.float32),
        "fg_feats": rng.randn(GLOBAL_BATCH, 8, 8, 16).astype(np.float32),
        "text_embeds": rng.randn(GLOBAL_BATCH, 77, 16).astype(np.float32),
    }
    return cfg, step_fn, unet_params, blobnet_params, lora_params, batch


def single_process_loss() -> float:
    """Oracle: the same step on one process/device (no distributed runtime).
    Called from the pytest process."""
    import jax

    from blobctrl_tpu.train import train_step as ts

    cfg, step_fn, up, bp, lp, batch = _common_setup()
    state = ts.init_train_state(cfg, bp, lp)
    _, metrics = step_fn(state, up, batch, jax.random.PRNGKey(3))
    return float(metrics["loss"])


def distributed_loss() -> float:
    """One DP train step over the global mesh; this process feeds only its
    local_rows of the global batch."""
    import jax

    from blobctrl_tpu.parallel import mesh as mesh_lib
    from blobctrl_tpu.parallel import multihost
    from blobctrl_tpu.train import train_step as ts

    cfg, step_fn, up, bp, lp, batch = _common_setup()

    mesh = mesh_lib.make_mesh(data=len(jax.devices()), model=1)
    rows = multihost.local_rows(GLOBAL_BATCH)
    local = {k: v[rows.start:rows.stop] for k, v in batch.items()}
    gbatch = multihost.host_local_batch(mesh, local)

    up = multihost.replicate(mesh, up)
    state = ts.init_train_state(cfg, multihost.replicate(mesh, bp),
                                multihost.replicate(mesh, lp))
    with mesh:
        # AOT-compile first, THEN line the processes up on the coordination
        # service: per-process compile times skew arbitrarily (cold caches,
        # loaded hosts), and the gloo context rendezvous inside the first
        # collective only tolerates ~30 s of skew. After the barrier every
        # process launches the compiled step near-simultaneously.
        compiled = step_fn.lower(state, up, gbatch,
                                 jax.random.PRNGKey(3)).compile()
        multihost.barrier("train_step_compiled")
        state, metrics = compiled(state, up, gbatch, jax.random.PRNGKey(3))
    loss = float(multihost.fetch(metrics)["loss"])
    multihost.sync("after_step")
    return loss


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}")
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_TEST_CACHE_DIR",
                                     "/tmp/jax_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from blobctrl_tpu.parallel import multihost
    active = multihost.initialize(f"127.0.0.1:{port}", num_processes=nproc,
                                  process_id=pid, cpu=True)
    assert active, "distributed runtime did not come up"
    assert len(jax.devices()) == nproc * LOCAL_DEVICES, jax.devices()
    assert len(jax.local_devices()) == LOCAL_DEVICES

    loss = distributed_loss()
    print(f"MHLOSS {pid} {loss:.10f}", flush=True)


if __name__ == "__main__":
    main()
