"""Golden demo-state replay: the reference ships 9 fixed-seed demo states
(/root/reference/assets/results/demo/*/state/state.json; SURVEY.md §4) that
serve as end-to-end regression fixtures. This harness replays one through the
TPU pipeline and scores outside-mask PSNR against the recorded outputs.

Requires the published checkpoints for meaningful PSNR; without them it still
validates the full replay path (state parsing -> blob score -> pipeline).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np


def load_state(demo_dir: str) -> Dict:
    with open(os.path.join(demo_dir, "state", "state.json")) as f:
        return json.load(f)


def _ellipse_from_state(entry) -> tuple:
    (c, axes, ang) = entry
    return ((float(c[0]), float(c[1])), (float(axes[0]), float(axes[1])), float(ang))


def load_images(demo_dir: str):
    from PIL import Image
    fg = Image.open(os.path.join(demo_dir, "object_image_gallery",
                                 "validation_object_region_center.png"))
    bg_path = os.path.join(demo_dir, "edited_result_gallery",
                           "edited_result_gallery_0.png")
    bg = Image.open(bg_path) if os.path.exists(bg_path) else None
    orig = Image.open(os.path.join(demo_dir, "input_image", "input_image.png"))
    expected_dir = os.path.join(demo_dir, "results_gallery")
    expected = []
    if os.path.isdir(expected_dir):
        for name in sorted(os.listdir(expected_dir)):
            expected.append(np.asarray(Image.open(os.path.join(expected_dir, name)).convert("RGB")))
    return fg, bg, orig, expected


def replay(pipeline, demo_dir: str, num_inference_steps: Optional[int] = None,
           num_samples: Optional[int] = None):
    """Returns (images (N,512,512,3) float, state, final_ellipse)."""
    from blobctrl_tpu.blob import math as blob_math
    from blobctrl_tpu.blob import viz as viz_lib

    state = load_state(demo_dir)
    fg, bg, orig, _ = load_images(demo_dir)
    width, height = fg.size
    lh, lw = height // 8, width // 8
    remove = bool(state.get("remove_blob_box"))
    n = num_samples if num_samples is not None else int(state["num_samples"])
    steps = num_inference_steps if num_inference_steps is not None \
        else int(state["num_inference_steps"])

    if not remove:
        final_ellipse = _ellipse_from_state(state["ellipse_lists"][-1][0])
        gs = blob_math.blob_score_from_ellipse(final_ellipse, width, height, (lh, lw))
        strength = float(state["blobnet_control_strength"])
        assert bg is not None, f"{demo_dir} missing edited background"
        bg_img = bg
    else:
        final_ellipse = _ellipse_from_state(state["ellipse_lists"][0][0])
        gs = blob_math.removal_score((lh, lw))
        strength = 0.0
        start_mask = viz_lib.ellipse_mask(final_ellipse, height, width)
        bg_img = viz_lib.composite_mask_and_image(
            start_mask, np.asarray(orig.convert("RGB")), (255, 255, 255))

    out = pipeline(
        prompt=[state["scene_prompt"]] * n,
        fg_image=fg, bg_image=bg_img, gs_score=np.asarray(gs),
        height=height, width=width, num_inference_steps=steps,
        guidance_scale=float(state["guidance_scale"]),
        seed=int(state["seed"]),
        blobnet_conditioning_scale=strength,
        blobnet_control_guidance_start=float(state["blobnet_control_guidance_start"]),
        blobnet_control_guidance_end=float(state["blobnet_control_guidance_end"]))
    return out.images, state, final_ellipse


def outside_mask_psnr(images: np.ndarray, expected: np.ndarray,
                      ellipses, height: int = 512, width: int = 512) -> float:
    """PSNR over pixels outside the union of the edit ellipses — the parity
    metric (BASELINE.md)."""
    from blobctrl_tpu.blob import viz as viz_lib
    mask = np.zeros((height, width), bool)
    for e in ellipses:
        mask |= viz_lib.ellipse_mask(e, height, width) > 0
    outside = ~mask
    a = np.asarray(images, np.float32)
    b = np.asarray(expected, np.float32)
    if b.max() > 1.5:
        b = b / 255.0
    mse = float(np.mean((a[..., outside, :] - b[..., outside, :]) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(1.0 / mse)
