"""Converters: torch/diffusers/transformers state_dicts -> blobctrl_tpu pytrees.

Layout conventions of this framework:
  * conv kernels HWIO (torch OIHW -> transpose (2,3,1,0))
  * linear kernels (in,out) (torch (out,in) -> transpose)
  * norm weight/bias -> scale/bias

Source key formats documented against the reference checkpoints:
  * SD-1.5 UNet / BlobNet: diffusers ModelMixin state dicts
    (/root/reference/diffusers/src/diffusers/models/unets/unet_2d_condition.py,
     /root/reference/blobctrl/models/blobnet.py)
  * VAE: diffusers AutoencoderKL
  * CLIP text / DINOv2: transformers
"""

from __future__ import annotations

import re
from typing import Any, Dict, List

import numpy as np
import jax.numpy as jnp


def _to_np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return t.detach().cpu().float().numpy()


def _conv(t) -> jnp.ndarray:
    return jnp.asarray(_to_np(t).transpose(2, 3, 1, 0))


def _linear(t) -> jnp.ndarray:
    return jnp.asarray(_to_np(t).T)


def _vec(t) -> jnp.ndarray:
    return jnp.asarray(_to_np(t))


def _set(tree: Dict[str, Any], path: List, value):
    """Insert value at a nested path; integer components index lists."""
    node = tree
    for i, part in enumerate(path[:-1]):
        nxt = path[i + 1]
        if isinstance(part, int):
            while len(node) <= part:
                node.append({} if not isinstance(nxt, int) else [])
            if node[part] == {} and isinstance(nxt, int):
                node[part] = []
            node = node[part]
        else:
            if part not in node:
                node[part] = [] if isinstance(nxt, int) else {}
            node = node[part]
    last = path[-1]
    if isinstance(last, int):
        while len(node) <= last:
            node.append(None)
        node[last] = value
    else:
        node[last] = value


def _tokenize(key: str) -> List:
    return [int(p) if p.isdigit() else p for p in key.split(".")]


# ---------------------------------------------------------------------------
# UNet / BlobNet
# ---------------------------------------------------------------------------

_NORM_NAMES = {"norm", "norm1", "norm2", "norm3", "conv_norm_out",
               "group_norm", "layer_norm", "norm_out"}


def _convert_param(path: List, tensor) -> tuple:
    """Returns (new_path, jnp array) for one torch parameter."""
    *prefix, leaf = path
    arr = _to_np(tensor)
    parent = prefix[-1] if prefix else ""
    if leaf == "weight":
        if arr.ndim == 4:
            return prefix + ["kernel"], _conv(tensor)
        if arr.ndim == 2:
            return prefix + ["kernel"], _linear(tensor)
        return prefix + ["scale"], _vec(tensor)
    if leaf == "bias":
        return prefix + ["bias"], _vec(tensor)
    raise ValueError(f"unhandled param {path}")


def _rewrite_unet_path(path: List) -> List:
    """diffusers module path -> blobctrl_tpu tree path (UNet & BlobNet)."""
    out: List = []
    i = 0
    while i < len(path):
        p = path[i]
        if p == "downsamplers":
            out.append("downsample")
            i += 2  # skip index 0
        elif p == "upsamplers":
            out.append("upsample")
            i += 2
        elif p == "transformer_blocks":
            out.append("blocks")
            i += 1
        elif p == "to_out":
            out.append("to_out")
            i += 2  # skip ".0" (Dropout is .1)
        elif p == "ff":
            out.append("ff")
            # ff.net.0.proj -> proj_in ; ff.net.2 -> proj_out
            assert path[i + 1] == "net"
            if path[i + 2] == 0:
                out.append("proj_in")
                i += 4  # ff net 0 proj
            else:
                out.append("proj_out")
                i += 3  # ff net 2
        elif p == "blobnet_down_blocks":
            out.append("zero_down")
            i += 1
        elif p == "blobnet_mid_block":
            out.append("zero_mid")
            i += 1
        elif p == "blobnet_up_blocks":
            out.append("zero_up")
            i += 1
        else:
            out.append(p)
            i += 1
    return out


def convert_unet(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a diffusers UNet2DConditionModel (or reference BlobNetModel)
    state_dict into a blobctrl_tpu params tree."""
    tree: Dict[str, Any] = {}
    for key, tensor in state_dict.items():
        path = _tokenize(key)
        # drop buffers / unused heads
        if path[0] in ("time_proj",):
            continue
        if "conv_act" in path:
            continue
        path = _rewrite_unet_path(path)
        new_path, arr = _convert_param(path, tensor)
        _set(tree, new_path, arr)
    return tree


# ---------------------------------------------------------------------------
# VAE (AutoencoderKL)
# ---------------------------------------------------------------------------

def _rewrite_vae_path(path: List) -> List:
    out: List = []
    i = 0
    while i < len(path):
        p = path[i]
        if p == "downsamplers":
            out.append("downsample")
            i += 2
        elif p == "upsamplers":
            out.append("upsample")
            i += 2
        elif p in ("to_q", "to_k", "to_v", "to_out", "group_norm"):
            out.append({"group_norm": "norm"}.get(p, p))
            i += 2 if p == "to_out" else 1
        else:
            out.append(p)
            i += 1
    return out


def convert_vae(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, tensor in state_dict.items():
        path = _rewrite_vae_path(_tokenize(key))
        new_path, arr = _convert_param(path, tensor)
        _set(tree, new_path, arr)
    return tree


# ---------------------------------------------------------------------------
# CLIP text encoder (transformers CLIPTextModel)
# ---------------------------------------------------------------------------

def convert_clip_text(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, tensor in state_dict.items():
        key = key.replace("text_model.", "")
        path = _tokenize(key)
        if path[:2] == ["embeddings", "position_ids"]:
            continue
        if path[:2] == ["embeddings", "token_embedding"]:
            _set(tree, ["token_embedding"], _vec(tensor))  # (vocab, d) as-is
            continue
        if path[:2] == ["embeddings", "position_embedding"]:
            _set(tree, ["position_embedding"], _vec(tensor))
            continue
        if path[0] == "encoder":
            path = path[1:]  # encoder.layers.i...
        new_path, arr = _convert_param(path, tensor)
        _set(tree, new_path, arr)
    return tree


# ---------------------------------------------------------------------------
# DINOv2 (transformers Dinov2Model)
# ---------------------------------------------------------------------------

def convert_dinov2(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, tensor in state_dict.items():
        path = _tokenize(key)
        if path[0] == "embeddings":
            if path[1] == "cls_token":
                _set(tree, ["cls_token"], _vec(tensor)[0])  # (1,1,d)->(1,d)
            elif path[1] == "mask_token":
                continue
            elif path[1] == "position_embeddings":
                _set(tree, ["position_embeddings"], _vec(tensor)[0])  # (1,N,d)->(N,d)
            elif path[1] == "patch_embeddings":
                # projection conv (d, 3, p, p)
                leaf = "kernel" if path[-1] == "weight" else "bias"
                val = _conv(tensor) if path[-1] == "weight" else _vec(tensor)
                _set(tree, ["patch_embed", leaf], val)
            continue
        if path[0] == "encoder":
            path = path[1:]
        if path[0] == "layer":
            # encoder.layer.N.attention.attention.query -> layers.N.attn.q
            path = ["layers"] + path[1:]
            if len(path) > 3 and path[2] == "attention":
                name = {"query": "q", "key": "k", "value": "v"}.get(path[4] if path[3] == "attention" else "", None)
                if path[3] == "attention":
                    path = path[:2] + ["attn", name] + path[5:]
                elif path[3] == "output":  # attention.output.dense
                    path = path[:2] + ["attn", "out"] + path[5:]
            if len(path) > 2 and path[2] in ("layer_scale1", "layer_scale2"):
                ls = "ls1" if path[2] == "layer_scale1" else "ls2"
                _set(tree, path[:2] + [ls], _vec(tensor))
                continue
        new_path, arr = _convert_param(path, tensor)
        _set(tree, new_path, arr)
    return tree
