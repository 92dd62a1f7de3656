"""DINOv2 vision transformer (the BlobCtrl appearance encoder;
transformers Dinov2Model numerics).

The pipeline uses DINOv2-large's pooler_output — the final-layernormed CLS
token — as a (1, 1024) appearance embedding per foreground object
(/root/reference/blobctrl/pipelines/pipeline_blobnet.py:690-703).

Architecture: patch conv (14x14/14) + CLS + interpolated position embeddings;
pre-LN blocks with per-channel LayerScale; final LN; pooled = CLS.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from blobctrl_tpu.nn import layers

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class DINOv2Config:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    image_size: int = 518  # checkpoint-native grid for position embeddings

    @staticmethod
    def large() -> "DINOv2Config":
        return DINOv2Config()


def _attn(params, x: Array, heads: int) -> Array:
    b, s, c = x.shape
    d = c // heads
    q = layers.linear(params["q"], x)
    k = layers.linear(params["k"], x)
    v = layers.linear(params["v"], x)
    split = lambda t: t.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k),
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, split(v))
    return layers.linear(params["out"], out.transpose(0, 2, 1, 3).reshape(b, s, c))


def _torch_bicubic_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) interpolation matrix matching torch F.interpolate
    mode='bicubic', align_corners=False, antialias=False (a = -0.75).
    Built host-side with numpy (static shapes)."""
    a = -0.75

    def cubic(x):
        x = np.abs(x)
        return np.where(
            x <= 1, ((a + 2) * x - (a + 3)) * x * x + 1,
            np.where(x < 2, (((x - 5) * x + 8) * x - 4) * a, 0.0))

    scale = src / dst
    coords = (np.arange(dst, dtype=np.float64) + 0.5) * scale - 0.5
    base = np.floor(coords).astype(np.int64)
    frac = coords - base
    mat = np.zeros((dst, src))
    for k in range(-1, 3):
        w = cubic(k - frac)
        idx = np.clip(base + k, 0, src - 1)
        np.add.at(mat, (np.arange(dst), idx), w)
    return mat


def interpolate_pos_embed(pos: Array, src_grid: int, dst_hw: Tuple[int, int]) -> Array:
    """(1+N, C) position table -> (1+gh*gw, C), CLS untouched, bicubic over
    the patch grid matching transformers Dinov2Embeddings
    .interpolate_pos_encoding (torch bicubic, NO antialias — jax.image.resize
    antialiases on downscale and diverges badly at the production
    37x37 -> 16x16 path)."""
    gh, gw = dst_hw
    if src_grid * src_grid + 1 == 1 + gh * gw and src_grid == gh == gw:
        return pos
    cls_tok, patch = pos[:1], pos[1:]
    c = patch.shape[-1]
    grid = patch.reshape(src_grid, src_grid, c).astype(jnp.float32)
    wh = jnp.asarray(_torch_bicubic_matrix(src_grid, gh), jnp.float32)
    ww = jnp.asarray(_torch_bicubic_matrix(src_grid, gw), jnp.float32)
    resized = jnp.einsum("hs,swc,wt->htc", wh, grid, ww.T)
    return jnp.concatenate([cls_tok, resized.reshape(gh * gw, c).astype(pos.dtype)], 0)


def apply(params, cfg: DINOv2Config, pixel_values: Array):
    """pixel_values: (B, H, W, 3) normalized (ImageNet mean/std).
    Returns (last_hidden_state (B, 1+N, C), pooler_output (B, C))."""
    b, h, w, _ = pixel_values.shape
    p = cfg.patch_size
    x = layers.conv2d(params["patch_embed"], pixel_values, stride=p, padding=0)
    gh, gw = x.shape[1], x.shape[2]
    x = x.reshape(b, gh * gw, -1)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (b, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1)
    src_grid = cfg.image_size // p
    pos = interpolate_pos_embed(params["position_embeddings"], src_grid, (gh, gw))
    x = x + pos.astype(x.dtype)

    eps = cfg.layer_norm_eps
    for layer in params["layers"]:
        hme = layers.layer_norm(layer["norm1"], x, eps)
        x = x + layer["ls1"] * _attn(layer["attn"], hme, cfg.num_heads)
        hme = layers.layer_norm(layer["norm2"], x, eps)
        hme = layers.linear(layer["mlp"]["fc1"], hme)
        hme = layers.gelu(hme)
        hme = layers.linear(layer["mlp"]["fc2"], hme)
        x = x + layer["ls2"] * hme

    x = layers.layer_norm(params["layernorm"], x, eps)
    return x, x[:, 0]


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_u8(images_uint8: np.ndarray, size: int = 224,
                  short_edge: Optional[int] = None) -> np.ndarray:
    """Host half of the AutoImageProcessor (BitImageProcessor) equivalent:
    (B,H,W,3) uint8 RGB -> PIL bicubic resize shortest side to `short_edge`
    (256 for the published DINOv2 processors), center-crop `size`. Returns
    uint8 — PIL resize re-quantizes, so this IS the exact intermediate —
    for cheap host->device transport; normalize on device with
    normalize_pixels (bit-identical f32 ops)."""
    from PIL import Image
    if short_edge is None:
        short_edge = 256 if size == 224 else size
    out = []
    for img in np.asarray(images_uint8, np.uint8):
        pil = Image.fromarray(img)
        w, h = pil.size
        if h < w:
            nh, nw = short_edge, max(1, round(w * short_edge / h))
        else:
            nh, nw = max(1, round(h * short_edge / w)), short_edge
        pil = pil.resize((nw, nh), Image.BICUBIC)
        left, top = (nw - size) // 2, (nh - size) // 2
        pil = pil.crop((left, top, left + size, top + size))
        out.append(np.asarray(pil, np.uint8))
    return np.stack(out)


def normalize_pixels(x):
    """(B,H,W,3) uint8 -> f32 ImageNet-normalized, the device half of
    preprocess (same 1/255, -mean, /std f32 op sequence as the host path)."""
    import jax.numpy as jnp
    x = x.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def preprocess(images_uint8: np.ndarray, size: int = 224,
               short_edge: Optional[int] = None) -> np.ndarray:
    """Host-side AutoImageProcessor (BitImageProcessor) equivalent:
    (B,H,W,3) uint8 RGB -> PIL bicubic resize shortest side to `short_edge`
    (256 for the published DINOv2 processors), center-crop `size`, 1/255,
    ImageNet normalize."""
    x = preprocess_u8(images_uint8, size, short_edge).astype(np.float32)
    x = x / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def init(key, cfg: DINOv2Config):
    keys = iter(jax.random.split(key, 4 + 8 * cfg.num_layers))
    c, m = cfg.hidden_size, cfg.intermediate_size
    n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
    p = {
        "patch_embed": layers.init_conv(next(keys), cfg.patch_size, cfg.patch_size, 3, c),
        "cls_token": jax.random.normal(next(keys), (1, c)) * 0.02,
        "position_embeddings": jax.random.normal(next(keys), (n_pos, c)) * 0.02,
        "layers": [],
        "layernorm": layers.init_norm(c),
    }
    for _ in range(cfg.num_layers):
        p["layers"].append({
            "norm1": layers.init_norm(c),
            "attn": {n: layers.init_linear(next(keys), c, c)
                     for n in ("q", "k", "v", "out")},
            "ls1": jnp.ones((c,)) * 1e-5,
            "norm2": layers.init_norm(c),
            "mlp": {"fc1": layers.init_linear(next(keys), c, m),
                    "fc2": layers.init_linear(next(keys), m, c)},
            "ls2": jnp.ones((c,)) * 1e-5,
        })
    return p
