"""AutoencoderKL (SD-1.5 VAE): encoder, decoder, diagonal-Gaussian latents.

Numerics match the vendored diffusers AutoencoderKL
(/root/reference/diffusers/src/diffusers/models/autoencoders/autoencoder_kl.py,
 vae.py): GroupNorm(32, eps=1e-6), SiLU, asymmetric (0,1,0,1) pad before the
stride-2 encoder downsample (downsampling.py:142), single-head residual
attention in both mid blocks, scaling_factor 0.18215 applied by the pipeline.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from blobctrl_tpu.nn import layers, resnet as rn
from blobctrl_tpu.parallel import kernel_sharding

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


def _attention_block(params, x: Array, norm_groups: int) -> Array:
    """Single-head spatial self-attention with residual (diffusers Attention
    with residual_connection=True, heads=1)."""
    n, h, w, c = x.shape
    residual = x
    hs = layers.group_norm(params["norm"], x, norm_groups, eps=1e-6)
    hs = hs.reshape(n, h * w, c)
    q = layers.linear(params["to_q"], hs)
    k = layers.linear(params["to_k"], hs)
    v = layers.linear(params["to_v"], hs)
    scale = 1.0 / (c ** 0.5)
    scores = jnp.einsum("nqc,nkc->nqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("nqk,nkc->nqc", probs, v)
    out = layers.linear(params["to_out"], out)
    return out.reshape(n, h, w, c) + residual


def _mid_block(params, x: Array, norm_groups: int) -> Array:
    x = rn.resnet_block(params["resnets"][0], x, None, norm_groups, eps=1e-6)
    x = _attention_block(params["attentions"][0], x, norm_groups)
    x = rn.resnet_block(params["resnets"][1], x, None, norm_groups, eps=1e-6)
    return x


def encode(params, cfg: VAEConfig, image: Array) -> Array:
    """image: (B, H, W, 3) in [-1, 1] -> moments (B, H/8, W/8, 2*latent)."""
    enc = params["encoder"]
    ng = cfg.norm_num_groups
    x = layers.conv2d(enc["conv_in"], image, padding=1)
    n_blocks = len(cfg.block_out_channels)
    for i, block in enumerate(enc["down_blocks"]):
        for res_p in block["resnets"]:
            x = rn.resnet_block(res_p, x, None, ng, eps=1e-6)
        if "downsample" in block:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = layers.conv2d(block["downsample"]["conv"], x, stride=2, padding=0)
    x = _mid_block(enc["mid_block"], x, ng)
    x = layers.group_norm(enc["conv_norm_out"], x, ng, eps=1e-6)
    x = layers.silu(x)
    x = layers.conv2d(enc["conv_out"], x, padding=1)
    return layers.conv2d(params["quant_conv"], x)


def decode(params, cfg: VAEConfig, latents: Array) -> Array:
    """latents: (B, h, w, 4) UNSCALED (divide by scaling_factor first)."""
    dec = params["decoder"]
    ng = cfg.norm_num_groups
    x = layers.conv2d(params["post_quant_conv"], latents)
    x = layers.conv2d(dec["conv_in"], x, padding=1)
    x = _mid_block(dec["mid_block"], x, ng)
    for block in dec["up_blocks"]:
        for res_p in block["resnets"]:
            x = rn.resnet_block(res_p, x, None, ng, eps=1e-6)
        if "upsample" in block:
            x = layers.nearest_upsample_2x(x)
            # 512^2/256^2 upsample convs: ~30 TFLOPS on the XLA path
            x = rn.conv3x3_routed(block["upsample"]["conv"], x)
    x = layers.group_norm(dec["conv_norm_out"], x, ng, eps=1e-6)
    x = layers.silu(x)
    return layers.conv2d(dec["conv_out"], x, padding=1)


def sample_latents(moments: Array, key: Optional[jax.Array] = None) -> Array:
    """Diagonal Gaussian: moments -> latent sample (or mode if key is None)."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if key is None:
        return mean
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


@kernel_sharding.scoped("vae")
def encode_to_scaled_latents(params, cfg: VAEConfig, image: Array,
                             key: Optional[jax.Array] = None) -> Array:
    """The pipeline's encode_latents path (pipeline_blobnet.py:300-309)."""
    return sample_latents(encode(params, cfg, image), key) * cfg.scaling_factor


@kernel_sharding.scoped("vae")
def decode_from_scaled_latents(params, cfg: VAEConfig, latents: Array) -> Array:
    return decode(params, cfg, latents / cfg.scaling_factor)


# ---------------------------------------------------------------------------
# init (training/tests)
# ---------------------------------------------------------------------------

def init_vae(key, cfg: VAEConfig):
    boc = cfg.block_out_channels
    n = len(boc)
    keys = iter(jax.random.split(key, 64))

    def resnets(c_in, c_out, count):
        out = [rn.init_resnet_block(next(keys), c_in, c_out, None)]
        for _ in range(count - 1):
            out.append(rn.init_resnet_block(next(keys), c_out, c_out, None))
        return out

    def attn(c):
        return {"norm": layers.init_norm(c),
                "to_q": layers.init_linear(next(keys), c, c),
                "to_k": layers.init_linear(next(keys), c, c),
                "to_v": layers.init_linear(next(keys), c, c),
                "to_out": layers.init_linear(next(keys), c, c)}

    enc = {"conv_in": layers.init_conv(next(keys), 3, 3, cfg.in_channels, boc[0]),
           "down_blocks": [], "mid_block": None}
    c = boc[0]
    for i in range(n):
        block = {"resnets": resnets(c, boc[i], cfg.layers_per_block)}
        if i < n - 1:
            block["downsample"] = {"conv": layers.init_conv(next(keys), 3, 3, boc[i], boc[i])}
        enc["down_blocks"].append(block)
        c = boc[i]
    enc["mid_block"] = {"resnets": resnets(c, c, 2), "attentions": [attn(c)]}
    enc["conv_norm_out"] = layers.init_norm(c)
    enc["conv_out"] = layers.init_conv(next(keys), 3, 3, c, 2 * cfg.latent_channels)

    dec = {"conv_in": layers.init_conv(next(keys), 3, 3, cfg.latent_channels, boc[-1]),
           "mid_block": {"resnets": resnets(boc[-1], boc[-1], 2),
                         "attentions": [attn(boc[-1])]},
           "up_blocks": []}
    rev = list(reversed(boc))
    c = rev[0]
    for i in range(n):
        block = {"resnets": resnets(c, rev[i], cfg.layers_per_block + 1)}
        if i < n - 1:
            block["upsample"] = {"conv": layers.init_conv(next(keys), 3, 3, rev[i], rev[i])}
        dec["up_blocks"].append(block)
        c = rev[i]
    dec["conv_norm_out"] = layers.init_norm(c)
    dec["conv_out"] = layers.init_conv(next(keys), 3, 3, c, cfg.out_channels)

    return {"encoder": enc, "decoder": dec,
            "quant_conv": layers.init_conv(next(keys), 1, 1, 2 * cfg.latent_channels, 2 * cfg.latent_channels),
            "post_quant_conv": layers.init_conv(next(keys), 1, 1, cfg.latent_channels, cfg.latent_channels)}
