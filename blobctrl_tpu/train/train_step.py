"""Self-supervised BlobCtrl training (BlobNet + UNet-LoRA), data-parallel.

The reference ships no training code (SURVEY.md §0); this implements the
BlobData-style objective implied by the inference path: reconstruct the noise
added to the ground-truth latents, conditioned on the fg blob splat + DINOv2
appearance features (BlobNet branch) and the masked background (UNet branch),
with the double-width layout and right-half loss.

Trainables: BlobNet params + UNet LoRA (A/B) by default; UNet/VAE/encoders
frozen. ``TrainConfig.train_unet_full`` instead trains the full base UNet
(from-scratch training — used by train/toy.py).
Sharding: batch over the ``data`` mesh axis; params replicated (optionally
model-sharded); XLA GSPMD inserts the gradient all-reduces.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from blobctrl_tpu.models import blobnet as blobnet_lib
from blobctrl_tpu.models import lora as lora_lib
from blobctrl_tpu.models import unet as unet_lib
from blobctrl_tpu.schedulers import ddim as ddim_lib

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    weight_decay: float = 1e-2
    max_grad_norm: float = 1.0
    num_train_timesteps: int = 1000
    lora_scale: float = 1.0
    remat: bool = True
    compute_dtype: Any = jnp.bfloat16
    # Train the full base UNet (from-scratch training / full fine-tune)
    # instead of a LoRA adapter over frozen weights. The second argument of
    # init_train_state / the frozen_unet_params argument of train_step are
    # then the full UNet params / ignored respectively.
    train_unet_full: bool = False
    # Exponential moving average of the trainables (standard for diffusion
    # fine-tunes; sampled weights come from the EMA shadow). 0 disables;
    # typical 0.999-0.9999. The shadow lives in state["ema"] and is
    # checkpointed with the rest of the state.
    ema_decay: float = 0.0
    # Learning-rate schedule: "constant" (after linear warmup) or "cosine"
    # (linear warmup -> cosine decay over lr_total_steps down to
    # lr_end_factor * learning_rate). Warmup of 0 with "constant" is a flat
    # scalar LR (the historical layout: no schedule-count leaf in
    # opt_state); any schedule adds optax's ScaleByScheduleState count, so
    # switching schedule on/off changes the checkpoint layout — keep the
    # flags stable across a resumed run.
    lr_warmup_steps: int = 0
    lr_schedule: str = "constant"
    lr_total_steps: int = 0          # required (> 0) for "cosine"
    lr_end_factor: float = 0.0


def make_lr(cfg: TrainConfig):
    """Scalar LR or an optax schedule per TrainConfig (see fields above)."""
    if cfg.lr_schedule == "cosine":
        if cfg.lr_total_steps <= 0:
            raise ValueError("lr_schedule='cosine' needs lr_total_steps > 0")
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.learning_rate,
            warmup_steps=cfg.lr_warmup_steps,
            decay_steps=cfg.lr_total_steps,
            end_value=cfg.lr_end_factor * cfg.learning_rate)
    if cfg.lr_schedule != "constant":
        raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r} "
                         "(constant | cosine)")
    if cfg.lr_warmup_steps > 0:
        # linear_schedule holds the end value after transition_steps
        return optax.linear_schedule(0.0, cfg.learning_rate,
                                     cfg.lr_warmup_steps)
    return cfg.learning_rate


def make_optimizer(cfg: TrainConfig):
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(make_lr(cfg), weight_decay=cfg.weight_decay),
    )


def init_train_state(cfg: TrainConfig, blobnet_params, adapter_params):
    """adapter_params: LoRA tree, or the full UNet tree when
    cfg.train_unet_full."""
    key = "unet" if cfg.train_unet_full else "lora"
    trainable = {"blobnet": blobnet_params, key: adapter_params}
    opt_state = make_optimizer(cfg).init(trainable)
    state = {"params": trainable, "opt_state": opt_state,
             "step": jnp.zeros((), jnp.int32)}
    if cfg.ema_decay > 0:
        state["ema"] = jax.tree_util.tree_map(jnp.copy, trainable)
    return state


def make_train_step(cfg: TrainConfig, unet_cfg: unet_lib.UNetConfig,
                    blobnet_cfg: blobnet_lib.BlobNetConfig):
    """Returns train_step(state, frozen_unet_params, batch, rng) -> (state, metrics).

    batch (all NHWC, batch-sharded over the data axis):
      x0_latents  (B, h, w, 4)  — VAE latents of the target image
      fg_latents  (B, h, w, 4)  — fg conditioning latents
      bg_latents  (B, h, w, 4)  — masked background latents
      fg_score    (B, h, w, 1)
      bg_score    (B, h, w, 1)
      fg_feats    (B, h, w, Cd) — DINOv2 appearance splat
      text_embeds (B, 77, Ct)
    """
    sqrt_acp, sqrt_1m_acp = ddim_lib.training_tables(cfg.num_train_timesteps)
    optimizer = make_optimizer(cfg)
    dtype = cfg.compute_dtype

    def crop_right(r: Array) -> Array:
        return r[:, :, r.shape[2] - r.shape[1]:, :]

    def loss_fn(trainable, frozen_unet_params, batch, rng):
        x0 = batch["x0_latents"].astype(jnp.float32)
        b = x0.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        t = jax.random.randint(rng_t, (b,), 0, cfg.num_train_timesteps)
        noise = jax.random.normal(rng_n, x0.shape, jnp.float32)
        x_t = ddim_lib.add_noise(sqrt_acp, sqrt_1m_acp, t, x0, noise)

        if cfg.train_unet_full:
            unet_params = trainable["unet"]
        else:
            unet_params = lora_lib.merge_lora(frozen_unet_params,
                                              trainable["lora"], cfg.lora_scale)

        lmi = x_t.astype(dtype)
        fg_score = batch["fg_score"].astype(dtype)
        bg_score = batch["bg_score"].astype(dtype)
        fg_feats = batch["fg_feats"].astype(dtype)
        blob_left = jnp.concatenate(
            [batch["fg_latents"].astype(dtype), fg_score, fg_feats], axis=-1)
        blob_right = jnp.concatenate([lmi, fg_score, fg_feats], axis=-1)
        blob_in = jnp.concatenate([blob_left, blob_right], axis=2)

        down, mid, up = blobnet_lib.blobnet_apply(
            trainable["blobnet"], blobnet_cfg, blob_in, t.astype(jnp.float32),
            conditioning_scale=1.0, remat=cfg.remat)

        unet_left = jnp.concatenate(
            [batch["bg_latents"].astype(dtype), bg_score], axis=-1)
        unet_right = jnp.concatenate([lmi, bg_score], axis=-1)
        unet_in = jnp.concatenate([unet_left, unet_right], axis=2)

        noise_pred = unet_lib.unet_apply(
            unet_params, unet_cfg, unet_in, t.astype(jnp.float32),
            batch["text_embeds"].astype(dtype),
            down_block_add_samples=[crop_right(r) for r in down],
            mid_block_add_sample=crop_right(mid),
            up_block_add_samples=[crop_right(r) for r in up],
            remat=cfg.remat)

        w = noise_pred.shape[2]
        noise_pred = noise_pred[:, :, w // 2:, :].astype(jnp.float32)
        loss = jnp.mean(jnp.square(noise_pred - noise))
        return loss

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state, frozen_unet_params, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            state["params"], frozen_unet_params, batch, rng)
        updates, opt_state = optimizer.update(grads, state["opt_state"],
                                              state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = {"params": params, "opt_state": opt_state,
                     "step": state["step"] + 1}
        if cfg.ema_decay > 0:
            d = cfg.ema_decay
            new_state["ema"] = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, state["ema"], params)
        lr = make_lr(cfg)
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads),
                   "lr": (lr(state["step"]) if callable(lr)
                          else jnp.asarray(lr, jnp.float32))}
        return new_state, metrics

    return train_step
