"""Guidance-interval CFG (arXiv 2404.07724), opt-in.

Steps inside the [cfg_guidance_start, cfg_guidance_end) window run the full
CFG pair (uncond+cond, UNet batch 2B); steps outside run only the conditional
rows — noise_pred = cond, exactly the guidance_scale=1 limit — at UNet batch
B. An all-outside window must therefore reproduce the guidance_scale=1.0 run
bit-for-bit, and a partial window is a bounded approximation of the exact
path (the reference guides every step, pipeline_blobnet.py:1096-1098)."""

import numpy as np
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.slow  # extra denoise-graph compiles
import pytest

import jax

from blobctrl_tpu.apps import flagship
from blobctrl_tpu.models import blobnet as blobnet_lib
from blobctrl_tpu.models import unet as unet_lib
from blobctrl_tpu.models import vae as vae_lib
from blobctrl_tpu.pipeline import BlobNetPipeline


@pytest.fixture(scope="module")
def pipe():
    key = jax.random.PRNGKey(0)
    unet_cfg, blobnet_cfg = flagship.tiny_configs(dino_c=16, ctx=16)
    vae_cfg = vae_lib.VAEConfig(block_out_channels=(8, 16, 16, 16),
                                layers_per_block=1, norm_num_groups=4)
    return BlobNetPipeline(
        unet_cfg=unet_cfg, unet_params=unet_lib.init_unet(key, unet_cfg),
        blobnet_cfg=blobnet_cfg,
        blobnet_params=blobnet_lib.init_blobnet(key, blobnet_cfg),
        vae_cfg=vae_cfg, vae_params=vae_lib.init_vae(key, vae_cfg))


def _kwargs(steps=8, **over):
    rng = np.random.RandomState(0)
    kw = dict(
        fg_image=rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
        bg_image=rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
        gs_score=np.stack([np.ones((1, 8, 8)),
                           rng.rand(1, 8, 8)], -1).astype(np.float32),
        height=64, width=64, num_inference_steps=steps, guidance_scale=7.5,
        prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
        negative_prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
        seed=1, fg_dino_feats=rng.randn(1, 16).astype(np.float32),
        blobnet_control_guidance_end=0.8)
    kw.update(over)
    return kw


def test_all_outside_window_equals_unguided(pipe):
    """Every step cond-only == the do_cfg=False (guidance_scale=1) path: the
    same ops on the same conditional rows, so the images must match."""
    unguided = pipe(**_kwargs(guidance_scale=1.0)).images
    windowed = pipe(**_kwargs(cfg_guidance_start=1.0,
                              cfg_guidance_end=1.0)).images
    np.testing.assert_allclose(unguided, windowed, atol=1e-5)


def test_partial_window_bounded_drift(pipe):
    """Guiding only the first half: a real approximation (differs from the
    exact path) that stays bounded and finite."""
    kw = _kwargs()
    exact = pipe(**kw).images
    windowed = pipe(cfg_guidance_end=0.5, **kw).images
    drift = np.abs(exact - windowed).max()
    assert drift > 0.0
    assert drift < 0.5
    assert np.isfinite(windowed).all()


def test_full_window_is_exact_graph(pipe):
    """(0, 1) window == the default: no cond branch, same cached graph."""
    kw = _kwargs()
    exact = pipe(**kw).images
    full = pipe(cfg_guidance_start=0.0, cfg_guidance_end=1.0, **kw).images
    np.testing.assert_array_equal(exact, full)


def test_incompatible_with_encoder_cache(pipe):
    with pytest.raises(ValueError, match="encoder_cache"):
        pipe(cfg_guidance_end=0.5, encoder_cache_interval=3, **_kwargs())


def test_remove_mode_window(pipe):
    """strength-0 (use_blobnet=False) cond-only branch also compiles/runs."""
    kw = _kwargs(blobnet_conditioning_scale=0.0)
    out = pipe(cfg_guidance_start=0.1, cfg_guidance_end=0.9, **kw).images
    assert np.isfinite(out).all()
