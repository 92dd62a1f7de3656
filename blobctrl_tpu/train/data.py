"""BlobData-style training batch construction.

The reference ships no training code; its method (inference path + paper)
implies the self-supervised recipe: take an image + object mask, fit the blob
ellipse, build the same conditioning the inference pipeline uses —
  fg = object re-centered on a white canvas,
  bg = image with the object region whited out,
  score = splatted blob,
  feats = DINOv2 appearance embedding splat —
and train BlobNet + UNet-LoRA to reconstruct the image's noised latents
(right-half loss). This module turns (image, mask, prompt) triples into the
batch dict consumed by train/train_step.py.

Host-side preprocessing (PIL/cv2) feeds jitted VAE/DINOv2 encoders; batches
are plain numpy dicts ready for mesh sharding.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from blobctrl_tpu.blob import editor as editor_lib
from blobctrl_tpu.blob import math as blob_math
from blobctrl_tpu.blob import viz as viz_lib


def build_example(pipeline, image: np.ndarray, mask: np.ndarray,
                  prompt_embeds: np.ndarray, size: int = 512,
                  inflate: float = 1.05,
                  whiteout_ellipse=None) -> Dict[str, np.ndarray]:
    """One training example from (image uint8 HxWx3 at `size`^2, binary mask).
    Uses the pipeline's jitted VAE/DINOv2 encoders.

    whiteout_ellipse: optional cv2-style ellipse whited out in the background
    conditioning — the move edit's vacated source region (and remove mode's
    erase region) are white at inference, so training should sample
    non-overlapping white-outs too (see train/toy.py build_dataset for the
    validated recipe: ~60% of examples with a distractor white-out, ~10%
    object-free examples with an all-bg score)."""
    import jax.numpy as jnp
    from blobctrl_tpu.models import dinov2 as dino_lib
    from blobctrl_tpu.pipeline.blobnet_pipeline import preprocess_image

    lh = lw = size // 8
    ellipse = editor_lib.ellipse_from_mask(mask)
    ellipse, _, _ = editor_lib.resize_ellipse(ellipse, inflate, size, size, 0)

    fg_img = editor_lib.object_region_on_canvas(image, mask, canvas=size)
    emask = viz_lib.ellipse_mask(ellipse, size, size)
    # The object (target) region is BLACKED, matching what the inference path
    # feeds the model (apps/session.py build_edited_background: start region
    # white, target region black). Training with a whited target would make
    # every inference input out-of-distribution — verified empirically by the
    # from-scratch toy training (train/toy.py), which uses the same
    # convention and whose move edits depend on it.
    bg_img = viz_lib.composite_mask_and_image(emask, image, (0, 0, 0))
    if whiteout_ellipse is not None:
        wmask = viz_lib.ellipse_mask(whiteout_ellipse, size, size)
        bg_img = viz_lib.composite_mask_and_image(wmask, bg_img,
                                                  (255, 255, 255))

    gs = np.asarray(blob_math.blob_score_from_ellipse(ellipse, size, size, (lh, lw)))
    bg_score, fg_score = gs[..., 0:1], gs[..., 1:2]

    x0 = np.asarray(pipeline._encode_image(
        jnp.asarray(preprocess_image(image, size, size))), np.float32)
    fg_lat = np.asarray(pipeline._encode_image(
        jnp.asarray(preprocess_image(fg_img, size, size))), np.float32)
    bg_lat = np.asarray(pipeline._encode_image(
        jnp.asarray(preprocess_image(bg_img, size, size))), np.float32)

    px = dino_lib.preprocess(fg_img[None], size=pipeline.dino_image_size)
    pooled = np.asarray(pipeline._encode_dino(jnp.asarray(px)), np.float32)
    fg_feats = fg_score * pooled[:, None, None, :]

    return {
        "x0_latents": x0[0], "fg_latents": fg_lat[0], "bg_latents": bg_lat[0],
        "fg_score": fg_score[0].astype(np.float32),
        "bg_score": bg_score[0].astype(np.float32),
        "fg_feats": fg_feats[0].astype(np.float32),
        "text_embeds": np.asarray(prompt_embeds, np.float32),
    }


def collate(examples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([e[k] for e in examples]) for k in examples[0]}


class BlobDataLoader:
    """Minimal epoch iterator over (image, mask, prompt_embeds) triples."""

    def __init__(self, pipeline, images: List[np.ndarray],
                 masks: List[np.ndarray], prompt_embeds: List[np.ndarray],
                 batch_size: int, size: int = 512, seed: int = 0):
        assert len(images) == len(masks) == len(prompt_embeds)
        if len(images) < batch_size:
            raise ValueError(
                f"dataset has {len(images)} examples but batch_size is "
                f"{batch_size}; the loader would yield zero batches")
        self.examples = [build_example(pipeline, im, mk, pe, size)
                         for im, mk, pe in zip(images, masks, prompt_embeds)]
        self.batch_size = batch_size
        self.rng = np.random.RandomState(seed)

    def __iter__(self):
        order = self.rng.permutation(len(self.examples))
        for i in range(0, len(order) - self.batch_size + 1, self.batch_size):
            yield collate([self.examples[j] for j in order[i:i + self.batch_size]])
