"""Flagship model builders: the SD-1.5 + BlobNet BlobCtrl stack at production
geometry, plus fast structural param initializers (zero kernels / unit norms)
for benchmarking and compile checks when the published checkpoints are not on
disk. Timing on TPU is data-independent, so benchmarks with structural params
measure exactly what checkpoint weights would.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from blobctrl_tpu.models import blobnet as blobnet_lib
from blobctrl_tpu.models import clip_text as clip_lib
from blobctrl_tpu.models import dinov2 as dino_lib
from blobctrl_tpu.models import unet as unet_lib
from blobctrl_tpu.models import vae as vae_lib


def sd15_unet_config() -> unet_lib.UNetConfig:
    """SD-1.5 UNet with conv_in widened 4->5 channels
    (scripts/blobctrl_inference.py:233-249)."""
    return unet_lib.UNetConfig(in_channels=5)


def blobctrl_blobnet_config() -> blobnet_lib.BlobNetConfig:
    """BlobNet consuming 1029 channels: 4 latent + 1 score + 1024 DINOv2
    (SURVEY.md §2.1)."""
    return blobnet_lib.BlobNetConfig(in_channels=4, conditioning_channels=1025)


def sd15_vae_config() -> vae_lib.VAEConfig:
    return vae_lib.VAEConfig()


def clip_vit_l_config() -> clip_lib.CLIPTextConfig:
    return clip_lib.CLIPTextConfig()


def dinov2_large_config() -> dino_lib.DINOv2Config:
    return dino_lib.DINOv2Config.large()


def structural_params(init_fn, cfg, dtype=jnp.bfloat16):
    """Param tree with the exact structure/shapes of init_fn(key, cfg) but
    materialized as zeros (norm scales stay ones) without running the RNG —
    instant even for ~1B-param models."""
    shapes = jax.eval_shape(lambda key: init_fn(key, cfg), jax.random.PRNGKey(0))

    def materialize(path, s):
        leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if leaf == "scale":
            return jnp.ones(s.shape, dtype)
        return jnp.zeros(s.shape, dtype)

    return jax.tree_util.tree_map_with_path(materialize, shapes)


def tiny_configs(dino_c: int = 16, ctx: int = 16):
    """Small geometry used by dryrun_multichip and tests."""
    unet_cfg = unet_lib.UNetConfig(
        in_channels=5, out_channels=4, block_out_channels=(8, 16),
        down_block_has_attn=(True, False), up_block_has_attn=(False, True),
        layers_per_block=2, cross_attention_dim=ctx, num_heads=2,
        norm_num_groups=4)
    blobnet_cfg = blobnet_lib.BlobNetConfig(
        in_channels=4, conditioning_channels=1 + dino_c,
        block_out_channels=(8, 16), down_block_has_attn=(True, False),
        up_block_has_attn=(False, True), layers_per_block=2,
        cross_attention_dim=None, num_heads=2, norm_num_groups=4)
    return unet_cfg, blobnet_cfg
