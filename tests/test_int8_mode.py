"""int8-everything opt-in mode (int8 global-k flash + int8 convs): e2e
drift bound at toy scale. The production quality gate is
`replay --all --score --int8` once real checkpoints exist (PERF_NOTES
'Round-3 levers' item 5) — this test only guards that the mode runs
end-to-end and stays in a sane neighborhood of the exact path."""

import numpy as np
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.slow  # extra denoise-graph compiles

import jax

from blobctrl_tpu.apps import flagship
from blobctrl_tpu.models import blobnet as blobnet_lib
from blobctrl_tpu.models import unet as unet_lib
from blobctrl_tpu.models import vae as vae_lib
from blobctrl_tpu.nn import attention
from blobctrl_tpu.ops import conv3x3 as conv_mod
from blobctrl_tpu.pipeline import BlobNetPipeline


def test_int8_everything_bounded_drift():
    key = jax.random.PRNGKey(0)
    unet_cfg, blobnet_cfg = flagship.tiny_configs(dino_c=16, ctx=16)
    vae_cfg = vae_lib.VAEConfig(block_out_channels=(8, 16, 16, 16),
                                layers_per_block=1, norm_num_groups=4)
    pipe = BlobNetPipeline(
        unet_cfg=unet_cfg, unet_params=unet_lib.init_unet(key, unet_cfg),
        blobnet_cfg=blobnet_cfg,
        blobnet_params=blobnet_lib.init_blobnet(key, blobnet_cfg),
        vae_cfg=vae_cfg, vae_params=vae_lib.init_vae(key, vae_cfg))

    rng = np.random.RandomState(0)
    kw = dict(
        fg_image=rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
        bg_image=rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
        gs_score=np.stack([np.ones((1, 8, 8)),
                           rng.rand(1, 8, 8)], -1).astype(np.float32),
        height=64, width=64, num_inference_steps=4, guidance_scale=7.5,
        prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
        negative_prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
        seed=1, fg_dino_feats=rng.randn(1, 16).astype(np.float32))

    exact = pipe(**kw).images
    # on CPU the flash kernel does not engage, so only the conv int8 path is
    # exercised e2e here (via the interpret conv backend); the flash int8
    # kernel has its own parity tests
    from blobctrl_tpu.nn import resnet as resnet_mod
    resnet_mod.set_conv_backend("interpret")
    conv_mod.set_conv_int8(True)
    pipe._denoise_cache.clear()
    try:
        got = pipe(**kw).images
    finally:
        conv_mod.set_conv_int8(False)
        resnet_mod.set_conv_backend("auto")
        pipe._denoise_cache.clear()

    assert got.shape == exact.shape and np.isfinite(got).all()
    # a 4-step random-weight diffusion amplifies perturbations chaotically;
    # require same-ballpark images, not parity (the real gate is PSNR on
    # checkpoints)
    assert np.abs(got - exact).mean() < 0.25, np.abs(got - exact).mean()
