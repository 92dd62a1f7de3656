"""Checkpoint IO: safetensors / torch-pickle -> blobctrl_tpu param trees.

Loads the exact artifact layout produced by the reference's downloader
(/root/reference/scripts/download_models.py):

  models/
    stable-diffusion-v1-5/{unet,vae,text_encoder,tokenizer,scheduler}/
    BlobCtrl/blobnet/diffusion_pytorch_model.safetensors
    BlobCtrl/unet_lora/... (PEFT format)
    dinov2-large/model.safetensors
    sam/sam_vit_h_4b8939.pth

All tensors load host-side as numpy, convert layout, then device_put.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from blobctrl_tpu.params import convert


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors import safe_open
    out = {}
    with safe_open(path, framework="numpy") as f:
        for k in f.keys():
            t = f.get_tensor(k)
            if t.dtype == np.float16 or str(t.dtype) == "bfloat16":
                t = t.astype(np.float32)
            out[k] = t
    return out


def _load_model_dir(model_dir: str) -> Dict[str, np.ndarray]:
    """Load a diffusers/transformers model directory (single- or multi-shard
    safetensors, or torch .bin fallback)."""
    names = sorted(os.listdir(model_dir))
    st = [n for n in names if n.endswith(".safetensors")]
    if st:
        out: Dict[str, np.ndarray] = {}
        for n in st:
            out.update(load_safetensors(os.path.join(model_dir, n)))
        return out
    bins = [n for n in names if n.endswith(".bin") or n.endswith(".pth")]
    if bins:
        import torch
        out = {}
        for n in bins:
            sd = torch.load(os.path.join(model_dir, n), map_location="cpu",
                            weights_only=True)
            out.update({k: v.float().numpy() for k, v in sd.items()})
        return out
    raise FileNotFoundError(f"no weights in {model_dir}")


def widen_conv_in(unet_tree: Dict[str, Any], new_in: int = 5) -> Dict[str, Any]:
    """Widen conv_in input channels with zero-init extra channels, matching
    scripts/blobctrl_inference.py:233-249 (HWIO layout here)."""
    k = np.asarray(unet_tree["conv_in"]["kernel"])
    kh, kw, cin, cout = k.shape
    if cin >= new_in:
        return unet_tree
    widened = np.zeros((kh, kw, new_in, cout), k.dtype)
    widened[:, :, :cin, :] = k
    unet_tree["conv_in"]["kernel"] = jnp.asarray(widened)
    return unet_tree


def load_sd15_unet(unet_dir: str, widen_to: Optional[int] = 5):
    tree = convert.convert_unet(_load_model_dir(unet_dir))
    if widen_to:
        tree = widen_conv_in(tree, widen_to)
    return tree


def load_blobnet(blobnet_dir: str):
    return convert.convert_unet(_load_model_dir(blobnet_dir))


def load_vae(vae_dir: str):
    return convert.convert_vae(_load_model_dir(vae_dir))


def load_clip_text(text_encoder_dir: str):
    return convert.convert_clip_text(_load_model_dir(text_encoder_dir))


def load_dinov2(dinov2_dir: str):
    return convert.convert_dinov2(_load_model_dir(dinov2_dir))


def load_sam(path: str):
    """Load a SAM checkpoint (torch pickle, original segment_anything OR
    transformers key format — sam/sam_vit_h_4b8939.pth in the reference
    download layout, /root/reference/scripts/download_models.py:15-30)."""
    import torch
    from blobctrl_tpu.params import convert_sam
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd and all(
            hasattr(v, "shape") for v in sd["state_dict"].values()):
        sd = sd["state_dict"]
    return convert_sam.convert_sam(sd)


def load_lora_dir(lora_dir: str, alpha: Optional[float] = None):
    from blobctrl_tpu.models import lora as lora_lib
    sd = _load_model_dir(lora_dir)
    # PEFT adapter_config.json carries lora_alpha
    cfg_path = os.path.join(lora_dir, "adapter_config.json")
    if alpha is None and os.path.exists(cfg_path):
        with open(cfg_path) as f:
            alpha = json.load(f).get("lora_alpha")
    return lora_lib.convert_lora_state_dict(sd), alpha


def load_pipeline(models_root: str, dtype=jnp.bfloat16, lora_scale: float = 1.0):
    """Assemble a BlobNetPipeline from the reference's checkpoint layout."""
    from blobctrl_tpu.apps import flagship
    from blobctrl_tpu.models import lora as lora_lib
    from blobctrl_tpu.nn import layers
    from blobctrl_tpu.params import config_io
    from blobctrl_tpu.pipeline import BlobNetPipeline
    from blobctrl_tpu.tokenizer import clip_bpe

    sd_root = os.path.join(models_root, "stable-diffusion-v1-5")

    def maybe_config(model_dir, from_diffusers, default):
        path = os.path.join(model_dir, "config.json")
        if os.path.exists(path):
            with open(path) as f:
                cfg = from_diffusers(json.load(f))
            return cfg
        return default

    unet_cfg = maybe_config(os.path.join(sd_root, "unet"),
                            config_io.unet_config_from_diffusers,
                            flagship.sd15_unet_config())
    if unet_cfg.in_channels == 4:  # widened at load
        import dataclasses
        unet_cfg = dataclasses.replace(unet_cfg, in_channels=5)
    blobnet_cfg = maybe_config(os.path.join(models_root, "BlobCtrl", "blobnet"),
                               config_io.blobnet_config_from_diffusers,
                               flagship.blobctrl_blobnet_config())
    clip_cfg = maybe_config(os.path.join(sd_root, "text_encoder"),
                            config_io.clip_text_config_from_transformers,
                            flagship.clip_vit_l_config())
    dino_cfg = maybe_config(os.path.join(models_root, "dinov2-large"),
                            config_io.dinov2_config_from_transformers,
                            flagship.dinov2_large_config())
    # The DINOv2 INPUT size is a processor property, not a model property
    # (the reference preprocesses via AutoImageProcessor, whose
    # preprocessor_config.json crops to 224 for dinov2-large —
    # pipeline_blobnet.py:696); read it from the downloaded layout.
    dino_image_size = 224
    pp_path = os.path.join(models_root, "dinov2-large",
                           "preprocessor_config.json")
    if os.path.exists(pp_path):
        with open(pp_path) as f:
            crop = json.load(f).get("crop_size") or {}
        dino_image_size = int(crop.get("height", dino_image_size))
    vae_cfg = maybe_config(os.path.join(sd_root, "vae"),
                           config_io.vae_config_from_diffusers,
                           flagship.sd15_vae_config())

    unet = load_sd15_unet(os.path.join(sd_root, "unet"))
    lora_tree, alpha = load_lora_dir(os.path.join(models_root, "BlobCtrl", "unet_lora"))
    unet = lora_lib.merge_lora(unet, lora_tree, scale=lora_scale, alpha=alpha)

    tok_dir = os.path.join(sd_root, "tokenizer")
    tokenizer = clip_bpe.CLIPTokenizer.from_dir(tok_dir) if os.path.isdir(tok_dir) else None

    pipe = BlobNetPipeline(
        unet_cfg=unet_cfg,
        unet_params=layers.cast(unet, dtype),
        blobnet_cfg=blobnet_cfg,
        blobnet_params=layers.cast(
            load_blobnet(os.path.join(models_root, "BlobCtrl", "blobnet")), dtype),
        vae_cfg=vae_cfg,
        vae_params=layers.cast(load_vae(os.path.join(sd_root, "vae")), dtype),
        clip_cfg=clip_cfg,
        clip_params=layers.cast(
            load_clip_text(os.path.join(sd_root, "text_encoder")), dtype),
        dino_cfg=dino_cfg,
        dino_params=layers.cast(
            load_dinov2(os.path.join(models_root, "dinov2-large")), dtype),
        tokenizer=tokenizer,
        dino_image_size=dino_image_size,
        dtype=dtype)
    # Record the adapter so the pipeline can rescale LoRA at runtime
    # (the reference reads cross_attention_kwargs["scale"] every step,
    # pipeline_blobnet.py:1044-1050; here BlobNetPipeline.set_lora_scale
    # re-merges the delta increment onto the merged weights).
    pipe._lora_tree = lora_tree
    pipe._lora_alpha = alpha
    pipe._lora_scale = lora_scale
    return pipe
