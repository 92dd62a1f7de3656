"""Cheap latent-space RGB previews of in-flight denoise steps.

The denoise loop is ONE compiled TPU graph (see blobnet_pipeline._get_edit_fn),
so intermediate images cannot come from the real VAE decoder without either
splitting the graph (a ~17-28 ms dispatch penalty per split on the tunneled
backends, PERF_NOTES "Fixed cost, round 4") or decoding in-graph every step
(~6 ms/step of device time plus a 0.79 MB d2h fetch per preview). Instead,
the pipeline's read-only ``callback_on_step_end`` ships the raw latents
(64 KB at 512²) and THIS module maps them to a
recognizable RGB thumbnail on the host with a fixed 4->3 linear projection —
the standard latent-preview approximation every SD serving stack uses
(diffusers' ``latents_to_rgb``; A1111's "approx" preview mode). Zero extra
device work; the only cost is the per-preview-step latent transfer, which
``callback_interval`` bounds.

The projection constants approximate the SD-1.5 VAE decoder restricted to a
1x1 conv; they are weight-family constants (valid for any SD-1.5-based
checkpoint, which is what BlobCtrl trains on — reference README model zoo),
not per-checkpoint data. Previews are approximations by construction; the
final image always comes from the real VAE decode.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

# 4 latent channels -> RGB, for SD-1.5-family VAE latents in scheduler space
# (i.e. already multiplied by the 0.18215 scaling factor, which is how the
# loop carries them). Same family of constants as diffusers
# utils.latents_to_rgb / A1111 "approx" preview.
LATENT_RGB_FACTORS = np.array(
    [[0.298, 0.207, 0.208],
     [0.187, 0.286, 0.173],
     [-0.158, 0.189, 0.264],
     [-0.184, -0.271, -0.473]], dtype=np.float32)
# the conventional application is rgb = 0.5 * (x @ F) + 0.5: the projection
# lands roughly in [-1, 1] and the affine maps it to [0, 1] (same transform
# the real decode path applies to VAE output, blobnet_pipeline edit())
LATENT_RGB_SCALE = np.float32(0.5)
LATENT_RGB_BIAS = np.float32(0.5)


def latent_to_rgb(latents: np.ndarray, out_width: Optional[int] = None,
                  upscale: int = 1) -> np.ndarray:
    """Map scheduler-space latents (N, h, w, 4) to uint8 RGB (N, h*u, w'*u, 3).

    The latents ``callback_on_step_end`` ships are the scheduler state —
    already single-width image latents (the double-width [fg_ref | image]
    working tensor exists only inside each UNet step; the loop crops the
    noise prediction back to the right half before the scheduler update).
    out_width: optional crop to the RIGHT-most columns, for callers feeding
    raw double-width activations instead. Default: no crop.
    upscale: integer nearest-neighbor upscale (previews are latent-resolution,
    1/8th of the image; 8 restores nominal size).
    """
    x = np.asarray(latents, np.float32)
    if x.ndim == 3:
        x = x[None]
    if x.ndim != 4 or x.shape[-1] != 4:
        raise ValueError(f"expected (N, h, w, 4) latents, got {x.shape}")
    w = x.shape[2] if out_width is None else int(out_width)
    if not 1 <= w <= x.shape[2]:
        raise ValueError(f"out_width {w} outside 1..{x.shape[2]}")
    x = x[:, :, x.shape[2] - w:, :]
    rgb = (x @ LATENT_RGB_FACTORS) * LATENT_RGB_SCALE + LATENT_RGB_BIAS
    rgb = np.clip(rgb * 255.0 + 0.5, 0.0, 255.0).astype(np.uint8)
    u = int(upscale)
    if u > 1:
        rgb = rgb.repeat(u, axis=1).repeat(u, axis=2)
    return rgb
