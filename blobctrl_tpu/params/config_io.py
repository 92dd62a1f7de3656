"""Config JSON round-trip — the ConfigMixin/register_to_config parity layer
(reference persists model configs as config.json next to the weights;
configuration_utils.py / blobnet.py:151).

Our configs are frozen dataclasses; this module serializes/restores them and
can also translate a diffusers config.json into our config classes.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Type, TypeVar

T = TypeVar("T")


def save_config(cfg, path: str):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    d = dataclasses.asdict(cfg)
    d["_class_name"] = type(cfg).__name__
    with open(path, "w") as f:
        json.dump(d, f, indent=2, default=str)


def load_config(cls: Type[T], path: str) -> T:
    with open(path) as f:
        d = json.load(f)
    d.pop("_class_name", None)
    fields = {f.name for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in d.items():
        if k not in fields:
            continue
        if isinstance(v, list):
            v = tuple(v)
        kwargs[k] = v
    return cls(**kwargs)


def unet_config_from_diffusers(config: Dict[str, Any]):
    """diffusers UNet2DConditionModel config.json -> UNetConfig."""
    from blobctrl_tpu.models.unet import UNetConfig
    down = tuple("CrossAttn" in t for t in config["down_block_types"])
    up = tuple("CrossAttn" in t for t in config["up_block_types"])
    heads = config.get("num_attention_heads") or config["attention_head_dim"]
    if isinstance(heads, (list, tuple)):
        heads = heads[0]
    return UNetConfig(
        in_channels=config["in_channels"],
        out_channels=config["out_channels"],
        block_out_channels=tuple(config["block_out_channels"]),
        down_block_has_attn=down,
        up_block_has_attn=up,
        layers_per_block=config["layers_per_block"],
        cross_attention_dim=config.get("cross_attention_dim"),
        num_heads=int(heads),
        norm_num_groups=config.get("norm_num_groups", 32),
        norm_eps=config.get("norm_eps", 1e-5),
        transformer_layers_per_block=config.get("transformer_layers_per_block", 1) or 1,
        flip_sin_to_cos=config.get("flip_sin_to_cos", True),
        freq_shift=config.get("freq_shift", 0),
    )


def vae_config_from_diffusers(config: Dict[str, Any]):
    from blobctrl_tpu.models.vae import VAEConfig
    return VAEConfig(
        in_channels=config.get("in_channels", 3),
        out_channels=config.get("out_channels", 3),
        latent_channels=config.get("latent_channels", 4),
        block_out_channels=tuple(config.get("block_out_channels",
                                            (128, 256, 512, 512))),
        layers_per_block=config.get("layers_per_block", 2),
        norm_num_groups=config.get("norm_num_groups", 32),
        scaling_factor=config.get("scaling_factor", 0.18215),
    )


def clip_text_config_from_transformers(config: Dict[str, Any]):
    from blobctrl_tpu.models.clip_text import CLIPTextConfig
    return CLIPTextConfig(
        vocab_size=config.get("vocab_size", 49408),
        hidden_size=config.get("hidden_size", 768),
        intermediate_size=config.get("intermediate_size", 3072),
        num_layers=config.get("num_hidden_layers", 12),
        num_heads=config.get("num_attention_heads", 12),
        max_positions=config.get("max_position_embeddings", 77),
        layer_norm_eps=config.get("layer_norm_eps", 1e-5),
        hidden_act=config.get("hidden_act", "quick_gelu"),
    )


def dinov2_config_from_transformers(config: Dict[str, Any]):
    from blobctrl_tpu.models.dinov2 import DINOv2Config
    return DINOv2Config(
        hidden_size=config.get("hidden_size", 1024),
        num_layers=config.get("num_hidden_layers", 24),
        num_heads=config.get("num_attention_heads", 16),
        intermediate_size=config.get("intermediate_size", 4096),
        patch_size=config.get("patch_size", 14),
        layer_norm_eps=config.get("layer_norm_eps", 1e-6),
        image_size=config.get("image_size", 518),
    )


def blobnet_config_to_diffusers(cfg) -> Dict[str, Any]:
    """BlobNetConfig -> reference BlobNetModel config.json dict (the inverse
    of blobnet_config_from_diffusers; used by the trainer's export path so a
    fabricated models_root is loadable by the reference layout loader)."""
    def types(has_attn, base):
        return ["CrossAttn" + base if a else base for a in has_attn]
    return {
        "_class_name": "BlobNetModel",
        "in_channels": cfg.in_channels,
        "conditioning_channels": cfg.conditioning_channels,
        "block_out_channels": list(cfg.block_out_channels),
        "down_block_types": types(cfg.down_block_has_attn, "DownBlock2D"),
        "up_block_types": types(cfg.up_block_has_attn, "UpBlock2D"),
        "layers_per_block": cfg.layers_per_block,
        "cross_attention_dim": cfg.cross_attention_dim,
        "attention_head_dim": cfg.num_heads,
        "norm_num_groups": cfg.norm_num_groups,
        "norm_eps": cfg.norm_eps,
    }


def blobnet_config_from_diffusers(config: Dict[str, Any]):
    """reference BlobNetModel config.json -> BlobNetConfig."""
    from blobctrl_tpu.models.blobnet import BlobNetConfig
    down = tuple("CrossAttn" in t for t in config["down_block_types"])
    up = tuple("CrossAttn" in t for t in config["up_block_types"])
    heads = config.get("num_attention_heads") or config["attention_head_dim"]
    if isinstance(heads, (list, tuple)):
        heads = heads[0]
    return BlobNetConfig(
        in_channels=config.get("in_channels", 4),
        conditioning_channels=config.get("conditioning_channels", 1025),
        block_out_channels=tuple(config["block_out_channels"]),
        down_block_has_attn=down,
        up_block_has_attn=up,
        layers_per_block=config["layers_per_block"],
        cross_attention_dim=config.get("cross_attention_dim"),
        num_heads=int(heads),
        norm_num_groups=config.get("norm_num_groups", 32),
        norm_eps=config.get("norm_eps", 1e-5),
    )
