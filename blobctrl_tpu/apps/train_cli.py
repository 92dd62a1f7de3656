"""Training entry point: BlobNet + UNet-LoRA self-supervised fine-tuning
(BASELINE config 5: data-parallel, bf16).

Data layout: --data_root with
  images/NAME.png   RGB images (resized/cropped to --size)
  masks/NAME.png    binary object masks (same stem)
  prompts.json      {"NAME": "a photo of ..."} (optional; empty prompt if absent)

Usage:
  python -m blobctrl_tpu.apps.train_cli --models_root models \
      --data_root data --batch_size 8 --steps 1000 --ckpt_dir ckpts

Multi-host (pod-scale) training: run the SAME command on every host — TPU
pods auto-detect the coordinator (parallel/multihost.py); for explicit
bring-up pass --coordinator host:port --num_processes N --process_id i.
--batch_size is per-process; each process loads a disjoint dataset stride
and feeds its local rows of the global batch.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def build_parser():
    p = argparse.ArgumentParser(description="BlobCtrl-TPU training")
    p.add_argument("--models_root", default="models")
    p.add_argument("--data_root", required=True)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--learning_rate", type=float, default=1e-5)
    p.add_argument("--lora_rank", type=int, default=16)
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="EMA shadow of the trainables (0 = off; typical "
                        "0.999); exports use the EMA weights when enabled")
    p.add_argument("--lr_warmup_steps", type=int, default=0,
                   help="linear LR warmup from 0 over this many steps")
    p.add_argument("--lr_schedule", choices=("constant", "cosine"),
                   default="constant",
                   help="constant (after warmup) or warmup->cosine decay "
                        "over --steps")
    p.add_argument("--full_finetune", action="store_true",
                   help="train the full base UNet instead of a LoRA adapter "
                        "(TrainConfig.train_unet_full; fits one v5e at 512^2 "
                        "with Adam — see scripts/bench_train_512.py)")
    p.add_argument("--ckpt_dir", default="ckpts")
    p.add_argument("--ckpt_every", type=int, default=500)
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--data_parallel", type=int, default=0,
                   help="mesh data size (0 = all devices)")
    p.add_argument("--coordinator", default=None,
                   help="host:port for explicit multi-host bring-up; TPU "
                        "pods auto-detect (run the SAME command on every "
                        "host), omit entirely for single-host")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--export_dir", default=None,
                   help="export trained blobnet/lora in reference formats")
    return p


def load_dataset(data_root: str, size: int):
    from PIL import Image
    from blobctrl_tpu.apps.session import initialize_image
    img_dir = os.path.join(data_root, "images")
    mask_dir = os.path.join(data_root, "masks")
    prompts_path = os.path.join(data_root, "prompts.json")
    prompts = {}
    if os.path.exists(prompts_path):
        with open(prompts_path) as f:
            prompts = json.load(f)
    images, masks, names = [], [], []
    for name in sorted(os.listdir(img_dir)):
        stem = os.path.splitext(name)[0]
        mpath = os.path.join(mask_dir, name)
        if not os.path.exists(mpath):
            continue
        img = initialize_image(np.asarray(Image.open(
            os.path.join(img_dir, name)).convert("RGB")), size)
        mask = np.asarray(Image.open(mpath).convert("L").resize((size, size)))
        images.append(img)
        masks.append((mask > 127).astype(np.uint8) * 255)
        names.append(stem)
    return images, masks, [prompts.get(n, "") for n in names]


def main():
    from blobctrl_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    args = build_parser().parse_args()
    import jax
    import jax.numpy as jnp

    from blobctrl_tpu.models import lora as lora_lib
    from blobctrl_tpu.parallel import mesh as mesh_lib
    from blobctrl_tpu.parallel import multihost

    # multi-host bring-up must precede any backend touch
    distributed = multihost.initialize(args.coordinator, args.num_processes,
                                       args.process_id)
    from blobctrl_tpu.params import io as params_io
    from blobctrl_tpu.train import checkpoint as ckpt_lib
    from blobctrl_tpu.train import data as data_lib
    from blobctrl_tpu.train import train_step as ts
    from blobctrl_tpu.utils.observability import log_event

    pipe = params_io.load_pipeline(args.models_root, dtype=jnp.bfloat16)
    images, masks, prompt_texts = load_dataset(args.data_root, args.size)
    if distributed:
        # each process loads a disjoint stride of the dataset and feeds its
        # local rows of the global batch (multihost.host_local_batch below);
        # --batch_size stays the PER-PROCESS batch
        i, n = multihost.process_index(), multihost.process_count()
        images, masks = images[i::n], masks[i::n]
        prompt_texts = prompt_texts[i::n]
        log_event("multihost", process=i, processes=n,
                  local_examples=len(images),
                  global_devices=len(jax.devices()))
    log_event("dataset_loaded", examples=len(images))

    pes = [np.asarray(pipe.encode_prompt(t, None, 1, do_cfg=False))[0]
           for t in prompt_texts]
    loader = data_lib.BlobDataLoader(pipe, images, masks, pes,
                                     batch_size=args.batch_size,
                                     size=args.size)

    cfg = ts.TrainConfig(learning_rate=args.learning_rate,
                         train_unet_full=args.full_finetune,
                         ema_decay=args.ema_decay,
                         lr_warmup_steps=args.lr_warmup_steps,
                         lr_schedule=args.lr_schedule,
                         lr_total_steps=args.steps)
    key = jax.random.PRNGKey(0)
    # trainable master weights must be fp32 — bf16 masters round away ~1e-5
    # AdamW updates (compute still runs in bf16 via TrainConfig.compute_dtype)
    to_fp32 = lambda tree: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.float32), tree)
    if args.full_finetune:
        adapter = to_fp32(pipe.unet_params)
    else:
        adapter = lora_lib.init_lora(key, pipe.unet_params,
                                     rank=args.lora_rank)
    state = ts.init_train_state(cfg, to_fp32(pipe.blobnet_params), adapter)
    if args.resume and ckpt_lib.latest_step(args.ckpt_dir) is not None:
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
        state = ckpt_lib.restore(args.ckpt_dir, abstract)
        log_event("resumed", step=int(state["step"]))

    data = args.data_parallel or len(jax.devices())
    mesh = mesh_lib.make_mesh(data=data, model=1)
    if distributed:
        unet_params = multihost.replicate(mesh, pipe.unet_params)
        state = multihost.replicate(mesh, state)
    else:
        unet_params = mesh_lib.shard_params(mesh, pipe.unet_params)
    step_fn = ts.make_train_step(cfg, pipe.unet_cfg, pipe.blobnet_cfg)

    step = int(state["step"])
    t0 = time.perf_counter()
    with mesh:
        while step < args.steps:
            for batch in loader:
                if step >= args.steps:
                    break
                batch = (multihost.host_local_batch(mesh, batch)
                         if distributed else mesh_lib.shard_batch(mesh, batch))
                state, metrics = step_fn(state, unet_params, batch,
                                         jax.random.PRNGKey(step))
                step += 1
                if step % args.log_every == 0:
                    metrics = multihost.fetch(metrics)
                    dt = (time.perf_counter() - t0) / args.log_every
                    t0 = time.perf_counter()
                    # global batch = per-process batch x process count;
                    # every process calls collective ops (save below), only
                    # the coordinator narrates
                    if multihost.is_coordinator():
                        gbs = args.batch_size * multihost.process_count()
                        log_event("train", step=step,
                                  loss=round(float(metrics["loss"]), 5),
                                  grad_norm=round(float(metrics["grad_norm"]),
                                                  4),
                                  sec_per_step=round(dt, 3),
                                  img_per_sec=round(gbs / dt, 2))
                if step % args.ckpt_every == 0 or step == args.steps:
                    ckpt_lib.save(args.ckpt_dir, state)
                    if multihost.is_coordinator():
                        log_event("checkpoint", step=step)

    if args.export_dir and multihost.is_coordinator():
        # safetensors export writes from host copies; trainables are
        # replicated so the coordinator's local shards carry the full
        # values. With EMA enabled the shadow weights are what ships.
        export_tree = multihost.fetch(state.get("ema", state["params"]))
        state = {**state, "params": export_tree}
        ckpt_lib.export_blobnet_safetensors(
            state["params"]["blobnet"],
            os.path.join(args.export_dir, "blobnet",
                         "diffusion_pytorch_model.safetensors"))
        if args.full_finetune:
            # the exporter's key inversion is generic over UNet-structured
            # trees (the blobnet zero_* renames simply don't match)
            ckpt_lib.export_blobnet_safetensors(
                state["params"]["unet"],
                os.path.join(args.export_dir, "unet",
                             "diffusion_pytorch_model.safetensors"))
        else:
            ckpt_lib.export_lora_safetensors(
                state["params"]["lora"],
                os.path.join(args.export_dir, "unet_lora",
                             "adapter_model.safetensors"))
        log_event("exported", dir=args.export_dir)


if __name__ == "__main__":
    main()
