"""ResnetBlock2D + Down/Upsample, matching diffusers numerics
(/root/reference/diffusers/src/diffusers/models/resnet.py ResnetBlock2D,
Downsample2D, Upsample2D) in NHWC.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from blobctrl_tpu.nn import layers

Array = jax.Array


def init_resnet_block(key, c_in: int, c_out: int, temb_dim: Optional[int]):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "norm1": layers.init_norm(c_in),
        "conv1": layers.init_conv(k1, 3, 3, c_in, c_out),
        "norm2": layers.init_norm(c_out),
        "conv2": layers.init_conv(k2, 3, 3, c_out, c_out),
    }
    if temb_dim is not None:
        p["time_emb_proj"] = layers.init_linear(k3, temb_dim, c_out)
    if c_in != c_out:
        p["conv_shortcut"] = layers.init_conv(k4, 1, 1, c_in, c_out)
    return p


def resnet_block(params, x: Array, temb: Optional[Array] = None,
                 norm_groups: int = 32, eps: float = 1e-5) -> Array:
    h = layers.group_norm(params["norm1"], x, norm_groups, eps)
    h = layers.silu(h)
    h = layers.conv2d(params["conv1"], h, padding=1)
    if temb is not None and "time_emb_proj" in params:
        t = layers.linear(params["time_emb_proj"], layers.silu(temb))
        h = h + t[:, None, None, :]
    h = layers.group_norm(params["norm2"], h, norm_groups, eps)
    h = layers.silu(h)
    h = layers.conv2d(params["conv2"], h, padding=1)
    if "conv_shortcut" in params:
        x = layers.conv2d(params["conv_shortcut"], x)
    return x + h


def init_downsample(key, c: int):
    return {"conv": layers.init_conv(key, 3, 3, c, c)}


def downsample_2d(params, x: Array) -> Array:
    return layers.conv2d(params["conv"], x, stride=2, padding=1)


def init_upsample(key, c_in: int, c_out: Optional[int] = None):
    return {"conv": layers.init_conv(key, 3, 3, c_in, c_out or c_in)}


def upsample_2d(params, x: Array, out_hw: Optional[tuple] = None) -> Array:
    if out_hw is None:
        x = layers.nearest_upsample_2x(x)
    else:
        # non-2x sizes only occur for odd inputs; nearest resize
        n, h, w, c = x.shape
        oh, ow = out_hw
        hi = (jnp.arange(oh) * h // oh).astype(jnp.int32)
        wi = (jnp.arange(ow) * w // ow).astype(jnp.int32)
        x = x[:, hi][:, :, wi]
    return layers.conv2d(params["conv"], x, padding=1)
