"""Shared harness for bench.py and scripts/bench_*.py / profile_*.py:
the flagship production pipeline with structural weights plus the standard
512^2 edit inputs. Keeps the benchmark definition in ONE place."""

from __future__ import annotations

import numpy as np


def enable_compile_cache():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def make_flagship_pipe(dtype=None):
    """Production-geometry BlobNetPipeline with structural params (zero
    kernels / unit norms — the published checkpoints are not on disk; TPU
    timing is data-independent so this measures exactly what checkpoint
    weights would)."""
    import jax.numpy as jnp

    from blobctrl_tpu.apps import flagship
    from blobctrl_tpu.models import blobnet as blobnet_lib
    from blobctrl_tpu.models import unet as unet_lib
    from blobctrl_tpu.models import vae as vae_lib
    from blobctrl_tpu.pipeline import BlobNetPipeline

    dtype = dtype or jnp.bfloat16
    unet_cfg = flagship.sd15_unet_config()
    blobnet_cfg = flagship.blobctrl_blobnet_config()
    vae_cfg = flagship.sd15_vae_config()
    return BlobNetPipeline(
        unet_cfg=unet_cfg,
        unet_params=flagship.structural_params(unet_lib.init_unet, unet_cfg,
                                               dtype),
        blobnet_cfg=blobnet_cfg,
        blobnet_params=flagship.structural_params(blobnet_lib.init_blobnet,
                                                  blobnet_cfg, dtype),
        vae_cfg=vae_cfg,
        vae_params=flagship.structural_params(vae_lib.init_vae, vae_cfg,
                                              dtype),
        dtype=dtype)


def make_edit_inputs(size: int = 512, seed: int = 0):
    """The standard bench inputs: random fg/bg images, one production-like
    blob score, CLIP-shaped prompt embeds, DINOv2-shaped appearance feats,
    fixed initial latents."""
    from blobctrl_tpu.blob import math as blob_math

    rng = np.random.RandomState(seed)
    return dict(
        fg_image=rng.randint(0, 255, (size, size, 3)).astype(np.uint8),
        bg_image=rng.randint(0, 255, (size, size, 3)).astype(np.uint8),
        gs_score=np.asarray(blob_math.blob_score_from_ellipse(
            ((size * 0.55, size * 0.5), (size * 0.25, size * 0.4), 30.0),
            size, size, (size // 8, size // 8))),
        prompt_embeds=rng.randn(1, 77, 768).astype(np.float32) * 0.02,
        negative_prompt_embeds=rng.randn(1, 77, 768).astype(np.float32) * 0.02,
        fg_dino_feats=rng.randn(1, 1024).astype(np.float32) * 0.1,
        latents=rng.randn(1, size // 8, size // 8, 4).astype(np.float32),
    )


def standard_edit_kwargs(size: int = 512, steps: int = 50):
    """Full kwargs for one production edit call (unipc, CFG 7.5, control
    strength 1.6, guidance window end 0.9)."""
    kw = make_edit_inputs(size)
    kw.update(height=size, width=size, num_inference_steps=steps,
              guidance_scale=7.5, blobnet_conditioning_scale=1.6,
              blobnet_control_guidance_end=0.9, scheduler="unipc")
    return kw
