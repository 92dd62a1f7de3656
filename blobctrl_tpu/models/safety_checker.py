"""Stable Diffusion safety checker: CLIP-vision image embeddings vs concept
embeddings with per-concept thresholds.

Implements the cosine-distance logic of diffusers'
StableDiffusionSafetyChecker (pipelines/stable_diffusion/safety_checker.py):
  special_cos  = cos(projected, special_care_embeds)  -> special scores
  concept_cos  = cos(projected, concept_embeds)       -> nsfw if any > 0
with a 0.01 adjustment when special care triggers.

The reference registers the checker but comments out the call
(pipeline_blobnet.py:1140-1141). Here the policy is an explicit pipeline
argument; this module supplies the full capability.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from blobctrl_tpu.models import clip_vision
from blobctrl_tpu.nn import layers

Array = jax.Array


def _cosine(a: Array, b: Array) -> Array:
    an = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    bn = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    return an @ bn.T


def check(params, cfg: clip_vision.CLIPVisionConfig,
          images01: np.ndarray) -> np.ndarray:
    """images01: (B, H, W, 3) float [0,1]. Returns (B,) bool has_nsfw."""
    px = clip_vision.preprocess(images01)
    _, pooled = clip_vision.apply(params["vision"], cfg, jnp.asarray(px))
    embeds = layers.linear(params["visual_projection"], pooled)

    special_cos = _cosine(embeds, params["special_care_embeds"])
    concept_cos = _cosine(embeds, params["concept_embeds"])

    special_scores = special_cos - params["special_care_embeds_weights"][None]
    special_care = jnp.any(special_scores > 0, axis=-1, keepdims=True)
    adjustment = jnp.where(special_care, 0.01, 0.0)
    concept_scores = (concept_cos - params["concept_embeds_weights"][None]
                      + adjustment)
    return np.asarray(jnp.any(concept_scores > 0, axis=-1))


def blackout(images01: np.ndarray, has_nsfw: np.ndarray) -> np.ndarray:
    out = np.asarray(images01).copy()
    out[np.asarray(has_nsfw)] = 0.0
    return out


def convert_safety_checker(state_dict) -> dict:
    """diffusers StableDiffusionSafetyChecker state_dict -> params tree."""
    from blobctrl_tpu.params import convert as C
    vis_sd = {k[len("vision_model."):]: v for k, v in state_dict.items()
              if k.startswith("vision_model.")}
    vision = convert_clip_vision(vis_sd)
    np_ = lambda t: np.asarray(t.detach().cpu().float().numpy()
                               if hasattr(t, "detach") else t)
    return {
        "vision": vision,
        "visual_projection": {"kernel": jnp.asarray(np_(state_dict["visual_projection.weight"]).T)},
        "concept_embeds": jnp.asarray(np_(state_dict["concept_embeds"])),
        "concept_embeds_weights": jnp.asarray(np_(state_dict["concept_embeds_weights"])),
        "special_care_embeds": jnp.asarray(np_(state_dict["special_care_embeds"])),
        "special_care_embeds_weights": jnp.asarray(np_(state_dict["special_care_embeds_weights"])),
    }


def convert_clip_vision(state_dict) -> dict:
    """transformers CLIPVisionModel state_dict -> params tree."""
    from blobctrl_tpu.params.convert import _convert_param, _set, _tokenize
    tree: dict = {}
    for key, tensor in state_dict.items():
        key = key.replace("vision_model.", "")
        path = _tokenize(key)
        if path[0] == "embeddings":
            np_ = np.asarray(tensor.detach().cpu().float().numpy()
                             if hasattr(tensor, "detach") else tensor)
            if path[1] == "class_embedding":
                _set(tree, ["class_embedding"], jnp.asarray(np_))
            elif path[1] == "patch_embedding":
                _set(tree, ["patch_embed", "kernel"],
                     jnp.asarray(np_.transpose(2, 3, 1, 0)))
            elif path[1] == "position_embedding":
                _set(tree, ["position_embedding"], jnp.asarray(np_))
            continue
        if path[0] == "encoder":
            path = path[1:]
        new_path, arr = _convert_param(path, tensor)
        _set(tree, new_path, arr)
    return tree
