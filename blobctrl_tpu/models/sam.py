"""SAM (Segment Anything) — image encoder (windowed ViT), prompt encoder, and
mask decoder — the demo's point-click -> mask -> blob initializer
(/root/reference/scripts/blobctrl_app.py:114-116, :1019-1043 uses
SamPredictor.set_image + predict(point_coords, point_labels,
multimask_output=False)).

Numerics match transformers SamModel (oracle-tested); the converter also
accepts the original segment_anything sam_vit_h checkpoint key format that
the reference downloads (scripts/download_models.py:15-30).

The heavy image encoder (~630M params for ViT-H) is a separate jitted module
that runs once per user click; prompt encoder + mask decoder are tiny.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from blobctrl_tpu.nn import layers

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    # vision encoder
    hidden_size: int = 1280
    num_layers: int = 32
    num_heads: int = 16
    mlp_dim: int = 5120
    patch_size: int = 16
    image_size: int = 1024
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    output_channels: int = 256
    # prompt encoder / mask decoder
    prompt_dim: int = 256
    decoder_heads: int = 8
    decoder_mlp_dim: int = 2048
    num_multimask_outputs: int = 3
    layer_norm_eps: float = 1e-6

    @staticmethod
    def vit_h() -> "SAMConfig":
        return SAMConfig()

    @property
    def embed_grid(self) -> int:
        return self.image_size // self.patch_size  # 64


# ---------------------------------------------------------------------------
# vision encoder
# ---------------------------------------------------------------------------

def _get_rel_pos(q_size: int, k_size: int, rel_pos: Array) -> Array:
    """Relative positional table lookup with linear interpolation to the
    needed span (SAM get_rel_pos semantics)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        # linear resize along the first axis (torch F.interpolate 'linear')
        src = rel_pos.astype(jnp.float32)
        n, c = src.shape
        scale = n / max_rel_dist
        coords = (jnp.arange(max_rel_dist, dtype=jnp.float32) + 0.5) * scale - 0.5
        coords = jnp.clip(coords, 0, n - 1)
        lo = jnp.floor(coords).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n - 1)
        frac = (coords - lo)[:, None]
        rel_pos = (src[lo] * (1 - frac) + src[hi] * frac).astype(rel_pos.dtype)
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    rel = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[rel.astype(jnp.int32)]


def _vision_attention(params, x: Array, heads: int, use_rel_pos: bool = True) -> Array:
    """x: (B, H, W, C) -> (B, H, W, C). Decomposed relative positions."""
    b, h, w, c = x.shape
    d = c // heads
    qkv = layers.linear(params["qkv"], x.reshape(b, h * w, c))
    qkv = qkv.reshape(b, h * w, 3, heads, d)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3).reshape(b * heads, h * w, d)
               for i in range(3))
    attn = jnp.einsum("bqd,bkd->bqk", q * (d ** -0.5), k,
                      preferred_element_type=jnp.float32)
    if use_rel_pos:
        rh = _get_rel_pos(h, h, params["rel_pos_h"]).astype(jnp.float32)
        rw = _get_rel_pos(w, w, params["rel_pos_w"]).astype(jnp.float32)
        r_q = q.reshape(b * heads, h, w, d).astype(jnp.float32)
        rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh)
        rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw)
        attn = (attn.reshape(b * heads, h, w, h, w)
                + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
                ).reshape(b * heads, h * w, h * w)
    probs = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
    out = jnp.einsum("bqk,bkd->bqd", probs, v)
    out = out.reshape(b, heads, h * w, d).transpose(0, 2, 1, 3).reshape(b, h, w, c)
    return layers.linear(params["proj"], out)


def _window_partition(x: Array, win: int) -> Tuple[Array, Tuple[int, int]]:
    b, h, w, c = x.shape
    ph, pw = (win - h % win) % win, (win - w % win) % win
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // win, win, wp // win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win, win, c)
    return x, (hp, wp)


def _window_unpartition(x: Array, win: int, pad_hw: Tuple[int, int],
                        hw: Tuple[int, int]) -> Array:
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // (hp // win * wp // win)
    x = x.reshape(b, hp // win, wp // win, win, win, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def vision_encoder(params, cfg: SAMConfig, pixel_values: Array) -> Array:
    """pixel_values: (B, 1024, 1024, 3) normalized -> (B, 64, 64, 256)."""
    x = layers.conv2d(params["patch_embed"], pixel_values,
                      stride=cfg.patch_size, padding=0)
    x = x + params["pos_embed"].astype(x.dtype)
    eps = cfg.layer_norm_eps
    for i, layer in enumerate(params["layers"]):
        shortcut = x
        h = layers.layer_norm(layer["layer_norm1"], x, eps)
        if i in cfg.global_attn_indexes:
            h = _vision_attention(layer["attn"], h, cfg.num_heads)
        else:
            hw = h.shape[1:3]
            hwin, pad_hw = _window_partition(h, cfg.window_size)
            hwin = _vision_attention(layer["attn"], hwin, cfg.num_heads)
            h = _window_unpartition(hwin, cfg.window_size, pad_hw, hw)
        x = shortcut + h
        h = layers.layer_norm(layer["layer_norm2"], x, eps)
        h = layers.linear(layer["mlp"]["lin1"], h)
        h = layers.gelu(h)
        x = x + layers.linear(layer["mlp"]["lin2"], h)
    # neck: conv1x1 -> LN -> conv3x3 -> LN (channels-last LN == SamLayerNorm
    # channels_first in NCHW)
    x = layers.conv2d(params["neck"]["conv1"], x)
    x = layers.layer_norm(params["neck"]["layer_norm1"], x, eps)
    x = layers.conv2d(params["neck"]["conv2"], x, padding=1)
    x = layers.layer_norm(params["neck"]["layer_norm2"], x, eps)
    return x


# ---------------------------------------------------------------------------
# prompt encoder
# ---------------------------------------------------------------------------

def _positional_embed(coords01: Array, gaussian_matrix: Array) -> Array:
    """coords01 in [0,1] (..., 2) -> (..., C) random Fourier features."""
    coords = coords01 * 2.0 - 1.0
    coords = coords @ gaussian_matrix.astype(coords.dtype)
    coords = 2.0 * jnp.pi * coords
    return jnp.concatenate([jnp.sin(coords), jnp.cos(coords)], axis=-1)


def encode_points(params, cfg: SAMConfig, points: Array, labels: Array,
                  pad_with_not_a_point: bool = True) -> Array:
    """points: (B, N, 2) pixel coords in the 1024-padded frame;
    labels: (B, N) in {1 pos, 0 neg, -1 pad}. Returns sparse embeddings
    (B, N(+1), C). A padding point is appended (SAM does this whenever boxes
    are absent)."""
    if pad_with_not_a_point:
        pad_pt = jnp.zeros((points.shape[0], 1, 2), points.dtype)
        pad_lb = -jnp.ones((labels.shape[0], 1), labels.dtype)
        points = jnp.concatenate([points, pad_pt], axis=1)
        labels = jnp.concatenate([labels, pad_lb], axis=1)
    coords = (points + 0.5) / cfg.image_size
    pe = _positional_embed(coords, params["shared_embedding"])
    lb = labels[..., None]
    out = jnp.where(lb == -1, params["not_a_point_embed"][None, None], pe)
    out = jnp.where(lb == 0, out + params["point_embed"][0][None, None], out)
    out = jnp.where(lb == 1, out + params["point_embed"][1][None, None], out)
    return out


def dense_no_mask_embedding(params, cfg: SAMConfig, batch: int) -> Array:
    g = cfg.embed_grid
    return jnp.broadcast_to(params["no_mask_embed"][None, None, None, :],
                            (batch, g, g, cfg.prompt_dim))


def image_grid_pe(params, cfg: SAMConfig) -> Array:
    """(grid, grid, C) positional encoding of the image embedding grid."""
    g = cfg.embed_grid
    ys = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    xs = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (g,g,2) [x,y]
    return _positional_embed(grid, params["shared_embedding"])


# ---------------------------------------------------------------------------
# mask decoder (two-way transformer)
# ---------------------------------------------------------------------------

def _decoder_attn(params, q: Array, k: Array, v: Array, heads: int) -> Array:
    b, nq, c = q.shape
    qp = layers.linear(params["q_proj"], q)
    kp = layers.linear(params["k_proj"], k)
    vp = layers.linear(params["v_proj"], v)
    d = qp.shape[-1] // heads
    split = lambda t: t.reshape(b, -1, heads, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", split(qp), split(kp),
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, split(vp))
    out = out.transpose(0, 2, 1, 3).reshape(b, nq, -1)
    return layers.linear(params["out_proj"], out)


def mask_decoder(params, cfg: SAMConfig, image_embeddings: Array,
                 image_pe: Array, sparse_prompt: Array,
                 dense_prompt: Array) -> Tuple[Array, Array]:
    """image_embeddings: (B, g, g, C); image_pe: (g, g, C);
    sparse_prompt: (B, N, C); dense_prompt: (B, g, g, C).
    Returns (masks (B, num_masks, 4g, 4g) logits, iou_pred (B, num_masks))."""
    b = image_embeddings.shape[0]
    g = cfg.embed_grid
    c = cfg.prompt_dim
    heads = cfg.decoder_heads
    eps = cfg.layer_norm_eps

    num_mask_tokens = cfg.num_multimask_outputs + 1
    output_tokens = jnp.concatenate(
        [params["iou_token"], params["mask_tokens"]], axis=0)  # (1+4, C)
    tokens = jnp.concatenate(
        [jnp.broadcast_to(output_tokens[None], (b, num_mask_tokens + 1, c)),
         sparse_prompt], axis=1)

    src = (image_embeddings + dense_prompt).reshape(b, g * g, c)
    pos_src = jnp.broadcast_to(image_pe.reshape(1, g * g, c), (b, g * g, c))

    queries, keys = tokens, src
    for layer in params["transformer"]["layers"]:
        is_first = layer is params["transformer"]["layers"][0]
        # self attention on tokens. Layer 0 (skip_first_layer_pe) REPLACES
        # queries with the attention output — no residual (SAM semantics);
        # later layers add token embeddings as q/k pe and keep the residual.
        if is_first:
            queries = _decoder_attn(layer["self_attn"], queries, queries,
                                    queries, heads)
        else:
            q = queries + tokens
            queries = queries + _decoder_attn(layer["self_attn"], q, q,
                                              queries, heads)
        queries = layers.layer_norm(layer["layer_norm1"], queries, eps)
        # cross attention token -> image
        q = queries + tokens
        k = keys + pos_src
        attn_out = _decoder_attn(layer["cross_attn_token_to_image"], q, k, keys, heads)
        queries = layers.layer_norm(layer["layer_norm2"], queries + attn_out, eps)
        # mlp
        h = layers.linear(layer["mlp"]["lin1"], queries)
        h = jax.nn.relu(h)
        h = layers.linear(layer["mlp"]["lin2"], h)
        queries = layers.layer_norm(layer["layer_norm3"], queries + h, eps)
        # cross attention image -> token
        q = queries + tokens
        k = keys + pos_src
        attn_out = _decoder_attn(layer["cross_attn_image_to_token"], k, q, queries, heads)
        keys = layers.layer_norm(layer["layer_norm4"], keys + attn_out, eps)

    q = queries + tokens
    k = keys + pos_src
    attn_out = _decoder_attn(params["transformer"]["final_attn_token_to_image"],
                             q, k, keys, heads)
    queries = layers.layer_norm(params["transformer"]["layer_norm_final_attn"],
                                queries + attn_out, eps)

    iou_token_out = queries[:, 0]
    mask_tokens_out = queries[:, 1:1 + num_mask_tokens]

    # upscale image embedding 4x with two transposed convs
    src_img = keys.reshape(b, g, g, c)
    up = _conv_transpose(params["upscale_conv1"], src_img, stride=2)
    up = layers.layer_norm(params["upscale_layer_norm"], up, eps)
    up = layers.gelu(up)
    up = _conv_transpose(params["upscale_conv2"], up, stride=2)
    up = layers.gelu(up)  # (B, 4g, 4g, c/8)

    hyper = []
    for i, mlp in enumerate(params["output_hypernetworks_mlps"]):
        h = mask_tokens_out[:, i]
        for j, lin in enumerate(mlp):
            h = layers.linear(lin, h)
            if j < len(mlp) - 1:
                h = jax.nn.relu(h)
        hyper.append(h)
    hyper = jnp.stack(hyper, axis=1)  # (B, num_masks, c/8)

    masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up)

    h = iou_token_out
    for j, lin in enumerate(params["iou_prediction_head"]):
        h = layers.linear(lin, h)
        if j < len(params["iou_prediction_head"]) - 1:
            h = jax.nn.relu(h)
    return masks, h


def _conv_transpose(params, x: Array, stride: int) -> Array:
    """2x2 stride-2 transposed conv matching torch ConvTranspose2d exactly:
    kernel stored (kh, kw, c_out, c_in) + transpose_kernel=True (which flips
    spatial taps and swaps I/O — without it the 2x2 sub-pixels are swapped)."""
    kernel = params["kernel"].astype(x.dtype)
    y = jax.lax.conv_transpose(
        x, kernel, strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


def select_mask(masks: Array, iou_pred: Array, multimask: bool) -> Tuple[Array, Array]:
    """SamPredictor semantics: multimask -> tokens 1..3, else token 0."""
    if multimask:
        return masks[:, 1:], iou_pred[:, 1:]
    return masks[:, :1], iou_pred[:, :1]


# ---------------------------------------------------------------------------
# predictor (host-side pre/post processing, matching SamPredictor)
# ---------------------------------------------------------------------------

SAM_PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
SAM_PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


def preprocess_image(image_rgb_uint8: np.ndarray, cfg: SAMConfig
                     ) -> Tuple[np.ndarray, Tuple[int, int], Tuple[int, int]]:
    """(H, W, 3) uint8 -> ((1,1024,1024,3) float, original (H, W),
    resized (h', w') before padding). PIL bilinear resize of the longest side
    to 1024 (ResizeLongestSide semantics)."""
    from PIL import Image
    h, w = image_rgb_uint8.shape[:2]
    scale = cfg.image_size / max(h, w)
    nh, nw = int(h * scale + 0.5), int(w * scale + 0.5)
    pil = Image.fromarray(image_rgb_uint8).resize((nw, nh), Image.BILINEAR)
    arr = (np.asarray(pil, np.float32) - SAM_PIXEL_MEAN) / SAM_PIXEL_STD
    out = np.zeros((cfg.image_size, cfg.image_size, 3), np.float32)
    out[:nh, :nw] = arr
    return out[None], (h, w), (nh, nw)


def transform_points(points_xy: np.ndarray, orig_hw: Tuple[int, int],
                     cfg: SAMConfig) -> np.ndarray:
    h, w = orig_hw
    scale = cfg.image_size / max(h, w)
    return np.asarray(points_xy, np.float32) * scale


def postprocess_masks(low_res_masks: Array, orig_hw: Tuple[int, int],
                      resized_hw: Tuple[int, int], cfg: SAMConfig) -> np.ndarray:
    """(B, M, 256, 256) logits -> (B, M, H, W) boolean masks."""
    from blobctrl_tpu.nn import layers as L
    m = jnp.asarray(low_res_masks, jnp.float32)
    b, nm, gh, gw = m.shape
    m = m.reshape(b * nm, gh, gw, 1)
    m = L.bilinear_resize(m, cfg.image_size, cfg.image_size)
    m = m[:, :resized_hw[0], :resized_hw[1], :]
    m = L.bilinear_resize(m, orig_hw[0], orig_hw[1])
    return np.asarray(m.reshape(b, nm, orig_hw[0], orig_hw[1]) > 0.0)


class SamPredictor:
    """Minimal functional analogue of segment_anything.SamPredictor."""

    def __init__(self, params, cfg: SAMConfig = SAMConfig.vit_h()):
        self.params = params
        self.cfg = cfg
        self._encode = jax.jit(lambda px: vision_encoder(params["vision"], cfg, px))
        self._embedding = None
        self._orig_hw = None
        self._resized_hw = None

    def set_image(self, image_rgb_uint8: np.ndarray):
        px, self._orig_hw, self._resized_hw = preprocess_image(image_rgb_uint8, self.cfg)
        self._embedding = self._encode(jnp.asarray(px))

    def predict(self, point_coords: np.ndarray, point_labels: np.ndarray,
                multimask_output: bool = False):
        assert self._embedding is not None, "call set_image first"
        cfg, params = self.cfg, self.params
        pts = transform_points(point_coords, self._orig_hw, cfg)[None]
        lbs = np.asarray(point_labels, np.int32)[None]
        sparse = encode_points(params["prompt"], cfg, jnp.asarray(pts),
                               jnp.asarray(lbs))
        dense = dense_no_mask_embedding(params["prompt"], cfg, 1)
        pe = image_grid_pe(params["prompt"], cfg)
        masks, iou = mask_decoder(params["decoder"], cfg, self._embedding,
                                  pe, sparse, dense)
        masks, iou = select_mask(masks, iou, multimask_output)
        out = postprocess_masks(masks, self._orig_hw, self._resized_hw, cfg)
        return out[0], np.asarray(iou[0]), np.asarray(masks[0])
