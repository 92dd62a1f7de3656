"""CLIP vision tower (ViT-L/14) — backbone of the Stable Diffusion safety
checker (registered in the reference pipeline, pipeline_blobnet.py:214; the
invocation is commented out at :1140-1141 — we keep the full capability and
make the policy explicit, SURVEY.md §5).

Matches transformers CLIPVisionModel numerics: class token + patch conv
(no bias) + learned positions, pre-LN, quick_gelu MLP blocks, post-LN,
pooled = post-LN CLS.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from blobctrl_tpu.nn import layers

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"


def _attn(params, x: Array, heads: int) -> Array:
    b, s, c = x.shape
    d = c // heads
    q = layers.linear(params["q_proj"], x)
    k = layers.linear(params["k_proj"], x)
    v = layers.linear(params["v_proj"], x)
    split = lambda t: t.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k),
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, split(v))
    return layers.linear(params["out_proj"],
                         out.transpose(0, 2, 1, 3).reshape(b, s, c))


def apply(params, cfg: CLIPVisionConfig, pixel_values: Array
          ) -> Tuple[Array, Array]:
    """pixel_values: (B, H, W, 3) CLIP-normalized.
    Returns (last_hidden_state, pooled CLS after post-LN)."""
    b = pixel_values.shape[0]
    x = layers.conv2d(params["patch_embed"], pixel_values,
                      stride=cfg.patch_size, padding=0)
    x = x.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(params["class_embedding"][None, None], (b, 1, cfg.hidden_size)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"][: x.shape[1]].astype(x.dtype)
    x = layers.layer_norm(params["pre_layrnorm"], x, cfg.layer_norm_eps)
    act = layers.ACTIVATIONS[cfg.hidden_act]
    for layer in params["layers"]:
        h = layers.layer_norm(layer["layer_norm1"], x, cfg.layer_norm_eps)
        x = x + _attn(layer["self_attn"], h, cfg.num_heads)
        h = layers.layer_norm(layer["layer_norm2"], x, cfg.layer_norm_eps)
        h = layers.linear(layer["mlp"]["fc1"], h)
        h = act(h)
        x = x + layers.linear(layer["mlp"]["fc2"], h)
    pooled = layers.layer_norm(params["post_layernorm"], x[:, 0], cfg.layer_norm_eps)
    return x, pooled


CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess(images01: np.ndarray, size: int = 224) -> np.ndarray:
    """(B, H, W, 3) float [0,1] -> CLIP-normalized (B, size, size, 3)
    (CLIPImageProcessor: bicubic shortest-edge resize + center crop)."""
    from PIL import Image
    out = []
    for img in images01:
        pil = Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8))
        w, h = pil.size
        if h < w:
            nh, nw = size, max(1, round(w * size / h))
        else:
            nh, nw = max(1, round(h * size / w)), size
        pil = pil.resize((nw, nh), Image.BICUBIC)
        left, top = (nw - size) // 2, (nh - size) // 2
        pil = pil.crop((left, top, left + size, top + size))
        out.append(np.asarray(pil, np.float32) / 255.0)
    return (np.stack(out) - CLIP_MEAN) / CLIP_STD
