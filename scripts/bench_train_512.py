"""Production-geometry training step on one v5e: does it fit, how fast.

SD-1.5 UNet (frozen, bf16) + LoRA + full BlobNet (f32 + Adam) at 512^2,
double-width layout, remat — the real BlobCtrl training configuration the
reference implies but never ships. Requires the round-3 kernel autodiff work:
custom VJPs on the Pallas conv/flash kernels and the q-chunked attention
backward (the plain backward would materialize 8.6 GB of probabilities at
the level-0 S=8192 shape).

    python scripts/bench_train_512.py [--batch 1] [--steps 4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from blobctrl_tpu.apps import flagship
    from blobctrl_tpu.models import blobnet as blobnet_lib
    from blobctrl_tpu.models import lora as lora_lib
    from blobctrl_tpu.models import unet as unet_lib
    from blobctrl_tpu.train import train_step as ts

    unet_cfg = flagship.sd15_unet_config()
    blobnet_cfg = flagship.blobctrl_blobnet_config()
    # structural params: timing is data-independent on TPU
    unet_params = flagship.structural_params(unet_lib.init_unet, unet_cfg,
                                             jnp.bfloat16)
    blobnet_params = flagship.structural_params(
        blobnet_lib.init_blobnet, blobnet_cfg, jnp.float32)
    lora_params = jax.tree.map(
        lambda a: a.astype(jnp.float32),
        lora_lib.init_lora(jax.random.PRNGKey(0), unet_params, rank=16))

    n_blob = sum(int(np.prod(a.shape))
                 for a in jax.tree.leaves(blobnet_params))
    n_lora = sum(int(np.prod(a.shape)) for a in jax.tree.leaves(lora_params))
    print(f"trainables: BlobNet {n_blob/1e6:.0f}M f32 + LoRA "
          f"{n_lora/1e6:.1f}M (Adam on both)", flush=True)

    cfg = ts.TrainConfig()  # bf16 compute, remat=True
    state = ts.init_train_state(cfg, blobnet_params, lora_params)
    step_fn = ts.make_train_step(cfg, unet_cfg, blobnet_cfg)

    b, lh = args.batch, args.size // 8
    rng = np.random.RandomState(0)
    batch = {
        "x0_latents": rng.randn(b, lh, lh, 4).astype(np.float32),
        "fg_latents": rng.randn(b, lh, lh, 4).astype(np.float32),
        "bg_latents": rng.randn(b, lh, lh, 4).astype(np.float32),
        "fg_score": rng.rand(b, lh, lh, 1).astype(np.float32),
        "bg_score": rng.rand(b, lh, lh, 1).astype(np.float32),
        "fg_feats": rng.randn(b, lh, lh, 1024).astype(np.float32),
        "text_embeds": rng.randn(b, 77, 768).astype(np.float32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    state, metrics = step_fn(state, unet_params, batch, key)
    jax.block_until_ready(metrics["loss"])
    print(f"first step (compile): {time.time() - t0:.1f}s "
          f"loss {float(metrics['loss']):.4f}", flush=True)

    # chained timing: the tunnel's block_until_ready lies (PERF_NOTES), so
    # time N dependent steps and fetch the final loss
    t0 = time.time()
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, unet_params, batch, sub)
    loss = float(metrics["loss"])
    dt = (time.time() - t0) / args.steps
    print(f"steady state: {dt*1000:.0f} ms/step at batch {args.batch} "
          f"({args.batch/dt:.2f} img/s) loss {loss:.4f}", flush=True)

    mem = jax.devices()[0].memory_stats()
    if mem:
        print(f"peak HBM: {mem.get('peak_bytes_in_use', 0)/2**30:.2f} GiB "
              f"of {mem.get('bytes_limit', 0)/2**30:.2f} GiB", flush=True)


if __name__ == "__main__":
    main()
