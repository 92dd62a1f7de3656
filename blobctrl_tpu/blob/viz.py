"""Blob visualization: composited score maps -> RGB images, ellipse overlays.

Equivalent to the reference viz path (visualize_features + BLOB_VIS_COLORS,
/root/reference/blobctrl/utils/utils.py:244-270, blobctrl_app.py:637-650)
with a procedurally generated palette.
"""

from __future__ import annotations

import colorsys
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from blobctrl_tpu.blob import math as blob_math


def default_palette(n: int = 29) -> np.ndarray:
    """(n, 3) float palette in [0,1]: a near-white background color followed
    by evenly spaced hues."""
    colors = [(0.98, 0.945, 0.918)]
    for i in range(n - 1):
        h = (i * 0.61803398875) % 1.0
        s = 0.55 + 0.25 * ((i * 7) % 3) / 2.0
        v = 0.75 + 0.2 * ((i * 5) % 2)
        colors.append(colorsys.hsv_to_rgb(h, min(s, 1.0), min(v, 1.0)))
    return np.asarray(colors, np.float32)


def blob_vis_image(xs, ys, covs, sizes, viz_hw: Tuple[int, int],
                   palette: Optional[np.ndarray] = None) -> np.ndarray:
    """Splat blobs at full resolution and color them: (H, W, 3) uint8."""
    from blobctrl_tpu.ops import blob_splat
    d_scores = blob_splat.splat_scores_auto(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(covs),
        jnp.asarray(sizes), viz_hw)  # (N, H, W, M+1); Pallas on TPU
    m1 = d_scores.shape[-1]
    pal = palette if palette is not None else default_palette()
    colors = jnp.asarray(pal[:m1], jnp.float32)[None]  # (1, M+1, 3)
    img = blob_math.splat_features_from_scores(d_scores, colors)
    arr = np.clip(np.asarray(img[0]), 0.0, 1.0)
    return (arr * 255).astype(np.uint8)


def blob_vis_from_ellipse(ellipse, width: int, height: int) -> np.ndarray:
    mean, cov = blob_math.gaussian_from_ellipse(ellipse)
    nmean, ncov = blob_math.normalize_gaussian(mean, cov, width, height)
    return blob_vis_image(np.asarray([[nmean[0]]]), np.asarray([[nmean[1]]]),
                          np.asarray(ncov)[None, None], np.ones((1, 1)),
                          (height, width))


def draw_ellipse(image: np.ndarray, ellipse, color=(0, 255, 0),
                 thickness: int = 3) -> np.ndarray:
    """cv2 ellipse overlay (vis_gt_ellipse_from_ellipse equivalent)."""
    import cv2
    out = np.ascontiguousarray(np.asarray(image))
    (xc, yc), (d1, d2), ang = ellipse
    cv2.ellipse(out, ((xc, yc), (d1, d2), ang), list(color), thickness)
    return out


def ellipse_mask(ellipse, height: int, width: int, antialias: bool = True) -> np.ndarray:
    """Filled ellipse mask (H, W) uint8 in {0..255}; LINE_AA like the app
    (blobctrl_app.py:1114-1121)."""
    import cv2
    m = np.zeros((height, width), np.float32)
    (xc, yc), (d1, d2), ang = ellipse
    line = cv2.LINE_AA if antialias else cv2.LINE_8
    cv2.ellipse(m, ((xc, yc), (d1, d2), ang), 1.0, -1, lineType=line)
    return (m * 255).astype(np.uint8)


def composite_mask_and_image(mask: np.ndarray, image: np.ndarray,
                             masked_color=(0, 0, 0)) -> np.ndarray:
    """Replace masked pixels with a flat color
    (blobctrl_inference.py:120-135 semantics: >0 for L masks, sum>255 for RGB)."""
    mask = np.asarray(mask)
    image = np.asarray(image)
    if mask.ndim == 2:
        ind = (mask > 0).astype(np.uint8)
    else:
        ind = (mask.sum(-1) > 255).astype(np.uint8)
    out = image * (1 - ind[..., None]) + np.asarray(masked_color) * ind[..., None]
    return out.astype(np.uint8)
