"""UNet2DCondition (SD-1.5 geometry) with BlobCtrl's injection-hook protocol
as a first-class functional argument.

Mirrors the behavior of the patched diffusers UNet
(/root/reference/diffusers/src/diffusers/models/unets/unet_2d_condition.py:1039-1353):
28 injection sites for SD-1.5 geometry — 12 down (1 post-conv_in + per-block
resnet/downsampler taps), 1 mid, 15 up — each applied to the right half of the
double-width sample (SURVEY.md §2.2).

NHWC activations; params are plain pytrees; the apply fn is pure and jittable.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from blobctrl_tpu.nn import layers, embeddings
from blobctrl_tpu.nn import unet_blocks as ub
from blobctrl_tpu.parallel import kernel_sharding

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    # True -> CrossAttnDownBlock2D-style (with spatial transformer), False -> plain
    down_block_has_attn: Tuple[bool, ...] = (True, True, True, False)
    up_block_has_attn: Tuple[bool, ...] = (False, True, True, True)
    layers_per_block: int = 2
    cross_attention_dim: Optional[int] = 768
    num_heads: int = 8
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    transformer_layers_per_block: int = 1
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @staticmethod
    def sd15(in_channels: int = 4) -> "UNetConfig":
        return UNetConfig(in_channels=in_channels)


def init_unet(key, cfg: UNetConfig):
    boc = cfg.block_out_channels
    n_blocks = len(boc)
    keys = jax.random.split(key, 4 + 2 * n_blocks)
    ki = iter(keys)

    params = {
        "conv_in": layers.init_conv(next(ki), 3, 3, cfg.in_channels, boc[0]),
        "time_embedding": embeddings.init_timestep_embedding(next(ki), boc[0], cfg.time_embed_dim),
        "down_blocks": [],
        "up_blocks": [],
    }

    out_ch = boc[0]
    for i in range(n_blocks):
        in_ch, out_ch = out_ch, boc[i]
        params["down_blocks"].append(ub.init_down_block(
            next(ki), in_ch, out_ch, cfg.time_embed_dim, cfg.layers_per_block,
            cfg.num_heads if cfg.down_block_has_attn[i] else None,
            cfg.cross_attention_dim, add_downsample=(i < n_blocks - 1),
            norm_groups=cfg.norm_num_groups,
            transformer_layers=cfg.transformer_layers_per_block))

    params["mid_block"] = ub.init_mid_block(
        next(ki), boc[-1], cfg.time_embed_dim, cfg.num_heads,
        cfg.cross_attention_dim, cfg.norm_num_groups,
        cfg.transformer_layers_per_block)

    rev = list(reversed(boc))
    prev_out = rev[0]
    for i in range(n_blocks):
        out_ch = rev[i]
        in_ch = rev[min(i + 1, n_blocks - 1)]
        params["up_blocks"].append(ub.init_up_block(
            next(ki), in_ch, out_ch, prev_out, cfg.time_embed_dim,
            cfg.layers_per_block + 1,
            cfg.num_heads if cfg.up_block_has_attn[i] else None,
            cfg.cross_attention_dim, add_upsample=(i < n_blocks - 1),
            norm_groups=cfg.norm_num_groups,
            transformer_layers=cfg.transformer_layers_per_block))
        prev_out = out_ch

    params["conv_norm_out"] = layers.init_norm(boc[0])
    params["conv_out"] = layers.init_conv(next(ki), 3, 3, boc[0], cfg.out_channels)
    return params


def time_embed(params, cfg: UNetConfig, timesteps: Array, dtype) -> Array:
    t_emb = embeddings.sinusoidal_timestep_embedding(
        timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift)
    return embeddings.timestep_embedding(params["time_embedding"], t_emb.astype(dtype))


def _norm_timesteps(timesteps: Array, batch: int) -> Array:
    if timesteps.ndim == 0:
        timesteps = jnp.broadcast_to(timesteps[None], (batch,))
    return timesteps


@kernel_sharding.scoped("unet")
def unet_encode(params, cfg: UNetConfig, sample: Array, timesteps: Array,
                encoder_hidden_states: Optional[Array] = None,
                down_block_add_samples: Optional[Sequence[Array]] = None,
                mid_block_add_sample: Optional[Array] = None,
                remat: bool = False) -> Tuple[Array, Tuple[Array, ...]]:
    """conv_in + down blocks + mid block (with the 12 down + 1 mid BlobNet
    injections applied). Returns (mid_activation, skip_stack) — the exact
    state Faster-Diffusion-style encoder propagation caches across steps
    (arXiv 2312.09608: encoder features vary little between adjacent steps)."""
    timesteps = _norm_timesteps(timesteps, sample.shape[0])
    ng, eps, heads = cfg.norm_num_groups, cfg.norm_eps, cfg.num_heads
    ctx = encoder_hidden_states
    emb = time_embed(params, cfg, timesteps, sample.dtype)

    x = layers.conv2d(params["conv_in"], sample, padding=1)
    down_q = ub.InjectionQueue(down_block_add_samples)
    x = down_q.apply(x)

    res_stack: List[Array] = [x]
    for i, block_p in enumerate(params["down_blocks"]):
        block_ctx = ctx if cfg.down_block_has_attn[i] else None
        block_heads = heads if cfg.down_block_has_attn[i] else None
        x, states = ub.down_block(block_p, x, emb, block_ctx, block_heads,
                                  down_q, ng, eps, remat=remat)
        res_stack.extend(states)

    x = ub.mid_block(params["mid_block"], x, emb, ctx, heads, ng, eps, remat=remat)
    if mid_block_add_sample is not None:
        x = ub.add_injection(x, mid_block_add_sample)
    down_q.assert_empty()
    return x, tuple(res_stack)


@kernel_sharding.scoped("unet")
def unet_decode(params, cfg: UNetConfig, x: Array, skip_stack, timesteps: Array,
                encoder_hidden_states: Optional[Array] = None,
                up_block_add_samples: Optional[Sequence[Array]] = None,
                remat: bool = False) -> Array:
    """Up blocks + out head, from an (x_mid, skip_stack) encoder state. The
    time embedding is recomputed here so cached encoder states still see the
    current step's embedding in the decoder resnets."""
    timesteps = _norm_timesteps(timesteps, x.shape[0])
    ng, eps, heads = cfg.norm_num_groups, cfg.norm_eps, cfg.num_heads
    ctx = encoder_hidden_states
    emb = time_embed(params, cfg, timesteps, x.dtype)
    up_q = ub.InjectionQueue(up_block_add_samples)

    res_stack = list(skip_stack)
    for i, block_p in enumerate(params["up_blocks"]):
        k = len(block_p["resnets"])
        skips, res_stack = res_stack[-k:], res_stack[:-k]
        upsample_hw = res_stack[-1].shape[1:3] if res_stack else None
        block_ctx = ctx if cfg.up_block_has_attn[i] else None
        block_heads = heads if cfg.up_block_has_attn[i] else None
        x, _ = ub.up_block(block_p, x, skips, emb, block_ctx, block_heads,
                           up_q, upsample_hw, ng, eps, remat=remat)
    up_q.assert_empty()

    x = layers.group_norm(params["conv_norm_out"], x, ng, eps)
    x = layers.silu(x)
    return layers.conv2d(params["conv_out"], x, padding=1)


def unet_apply(params, cfg: UNetConfig, sample: Array, timesteps: Array,
               encoder_hidden_states: Optional[Array] = None,
               down_block_add_samples: Optional[Sequence[Array]] = None,
               mid_block_add_sample: Optional[Array] = None,
               up_block_add_samples: Optional[Sequence[Array]] = None,
               remat: bool = False) -> Array:
    """sample: (B, H, W, C_in) NHWC; timesteps: (B,) or scalar.

    The three *add_samples args carry BlobNet residuals (right-half-cropped by
    the pipeline, see pipeline_blobnet.py:1085-1087) and are consumed in the
    reference's exact order.
    """
    x, res_stack = unet_encode(params, cfg, sample, timesteps,
                               encoder_hidden_states, down_block_add_samples,
                               mid_block_add_sample, remat=remat)
    return unet_decode(params, cfg, x, res_stack, timesteps,
                       encoder_hidden_states, up_block_add_samples,
                       remat=remat)
