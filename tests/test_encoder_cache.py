"""Faster-Diffusion encoder propagation (arXiv 2312.09608), opt-in.

Key steps run BlobNet + the full UNet; reuse steps run the decoder only with
the previous key step's cached encoder state. interval<=1 (or a mask of all
keys) must be EXACT; sparse keys must stay within a bounded drift of the
exact path."""

import numpy as np
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.slow  # three denoise-graph compiles
import pytest

import jax
import jax.numpy as jnp

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


def _kwargs(steps=8):
    rng = np.random.RandomState(0)
    return dict(
        fg_image=rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
        bg_image=rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
        gs_score=np.stack([np.ones((1, 8, 8)),
                           rng.rand(1, 8, 8)], -1).astype(np.float32),
        height=64, width=64, num_inference_steps=steps, guidance_scale=7.5,
        prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
        negative_prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
        seed=1, fg_dino_feats=rng.randn(1, 16).astype(np.float32),
        blobnet_control_guidance_end=0.8)


def test_unet_encode_decode_composition(pipe):
    """unet_apply == unet_decode(unet_encode(...)) by construction; the
    cached graph with an all-key mask must be bit-exact vs the plain path."""
    kw = _kwargs()
    exact = pipe(**kw).images
    allkeys = pipe(encoder_cache_interval=2, encoder_cache_warmup=8, **kw).images
    np.testing.assert_allclose(exact, allkeys, atol=1e-5)


def test_encoder_cache_bounded_drift(pipe):
    kw = _kwargs()
    exact = pipe(**kw).images
    cached = pipe(encoder_cache_interval=3, encoder_cache_warmup=2, **kw).images
    drift = np.abs(exact - cached).max()
    assert drift > 0.0            # it IS an approximation
    assert drift < 0.15           # ...a bounded one
    assert np.isfinite(cached).all()


def test_encoder_cache_remove_mode(pipe):
    """strength-0 (remove) path has no BlobNet residual cache entries."""
    kw = _kwargs()
    kw["blobnet_conditioning_scale"] = 0.0
    exact = pipe(**kw).images
    cached = pipe(encoder_cache_interval=4, encoder_cache_warmup=1, **kw).images
    assert np.isfinite(cached).all()
    assert np.abs(exact - cached).max() < 0.3
