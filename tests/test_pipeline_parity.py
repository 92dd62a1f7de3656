"""End-to-end pipeline parity: tiny random-weight models through BOTH stacks
(reference StableDiffusionBlobNetPipeline on torch CPU vs BlobNetPipeline on
JAX CPU), same latents / embeddings / blob score, compare output images.

This is the strongest correctness statement available without the published
checkpoints: the whole edit path — VAE encode, DINOv2 appearance embedding,
feature splat, width-concat inputs, BlobNet residuals, 28 injections, CFG,
UniPC — agrees numerically with the reference implementation.
"""

import importlib.util
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blobctrl_tpu.models import blobnet as blobnet_lib
from blobctrl_tpu.models import dinov2 as dino_lib
from blobctrl_tpu.models import unet as unet_lib
from blobctrl_tpu.models import vae as vae_lib
from blobctrl_tpu.params import convert
from blobctrl_tpu.pipeline import BlobNetPipeline
from tests.oracles import assert_close, import_diffusers, REFERENCE_ROOT

torch = pytest.importorskip("torch")

RNG = np.random.RandomState(11)

H = W = 64          # pixel size
LH = LW = 8         # latent size
CTX = 16            # cross-attn dim
DINO_C = 16


def _load_ref_module(name, path):
    import_diffusers()
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def build_torch_models():
    import_diffusers()
    from diffusers import AutoencoderKL, UNet2DConditionModel, UniPCMultistepScheduler
    from transformers import Dinov2Model, Dinov2Config, BitImageProcessor

    torch.manual_seed(0)
    unet = UNet2DConditionModel(
        sample_size=LH, in_channels=5, out_channels=4,
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        cross_attention_dim=CTX, attention_head_dim=2, norm_num_groups=4,
        layers_per_block=2).eval()

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import blobctrl.models.blobnet as ref_blobnet_mod
    blobnet = ref_blobnet_mod.BlobNetModel(
        in_channels=4, conditioning_channels=1 + DINO_C,
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        cross_attention_dim=None, attention_head_dim=2, norm_num_groups=4,
        layers_per_block=2).eval()
    with torch.no_grad():  # non-trivial taps
        for m in (list(blobnet.blobnet_down_blocks) + [blobnet.blobnet_mid_block]
                  + list(blobnet.blobnet_up_blocks)):
            m.weight.copy_(torch.randn_like(m.weight) * 0.05)
            m.bias.copy_(torch.randn_like(m.bias) * 0.05)

    vae = AutoencoderKL(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(8, 16, 16, 16), layers_per_block=1,
        norm_num_groups=4,
        down_block_types=("DownEncoderBlock2D",) * 4,
        up_block_types=("UpDecoderBlock2D",) * 4, sample_size=H).eval()

    dinov2 = Dinov2Model(Dinov2Config(
        hidden_size=DINO_C, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=32, image_size=28, patch_size=14)).eval()
    dinov2_processor = BitImageProcessor(
        do_resize=True, size={"shortest_edge": 28},
        do_center_crop=True, crop_size={"height": 28, "width": 28},
        do_rescale=True, do_normalize=True,
        image_mean=[0.485, 0.456, 0.406], image_std=[0.229, 0.224, 0.225])

    scheduler = UniPCMultistepScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear")

    # a tiny text encoder so oracle attribute accesses work (the test passes
    # prompt_embeds directly, so it is never run)
    from transformers import CLIPTextModel, CLIPTextConfig
    text_encoder = CLIPTextModel(CLIPTextConfig(
        vocab_size=49, hidden_size=CTX, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=2,
        max_position_embeddings=77)).eval()
    return unet, blobnet, vae, dinov2, dinov2_processor, scheduler, text_encoder


@pytest.mark.slow
def test_pipeline_end_to_end_parity():
    from PIL import Image
    unet_t, blobnet_t, vae_t, dinov2_t, dproc, sched_t, text_t = build_torch_models()

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import blobctrl.pipelines.pipeline_blobnet as ref_pipe_mod
    ref_pipe = ref_pipe_mod.StableDiffusionBlobNetPipeline(
        vae=vae_t, unet=unet_t, tokenizer=None, text_encoder=text_t,
        blobnet=blobnet_t, scheduler=sched_t, safety_checker=None,
        dinov2_processor=dproc, dinov2=dinov2_t,
        requires_safety_checker=False)

    # deterministic VAE sampling in the oracle (we use the mode)
    from diffusers.models.autoencoders.vae import DiagonalGaussianDistribution
    orig_sample = DiagonalGaussianDistribution.sample
    DiagonalGaussianDistribution.sample = lambda self, generator=None: self.mode()

    steps = 4
    fg_img = Image.fromarray(RNG.randint(0, 255, (H, W, 3), dtype=np.uint8))
    bg_img = Image.fromarray(RNG.randint(0, 255, (H, W, 3), dtype=np.uint8))
    # blob score (bg, fg) from an ellipse
    from blobctrl_tpu.blob import math as blob_math
    gs = blob_math.blob_score_from_ellipse(((32., 30.), (20., 34.), 25.), W, H,
                                           (LH, LW))  # (1,lh,lw,2)
    gs_nchw = np.moveaxis(np.asarray(gs), -1, 1)

    pe = RNG.randn(1, 7, CTX).astype(np.float32)
    npe = RNG.randn(1, 7, CTX).astype(np.float32)
    lat0 = RNG.randn(1, 4, LH, LW).astype(np.float32)

    try:
        with torch.no_grad():
            ref_out = ref_pipe(
                prompt=None, fg_image=fg_img, bg_image=bg_img,
                gs_score=torch.from_numpy(gs_nchw),
                height=H, width=W, num_inference_steps=steps,
                guidance_scale=7.5,
                latents=torch.from_numpy(lat0),
                prompt_embeds=torch.from_numpy(pe),
                negative_prompt_embeds=torch.from_numpy(npe),
                blobnet_conditioning_scale=1.6,
                blobnet_control_guidance_start=0.0,
                blobnet_control_guidance_end=0.9,
                output_type="np", return_dict=False)[0]
    finally:
        DiagonalGaussianDistribution.sample = orig_sample

    # --- our stack, converted weights ---
    pipe = BlobNetPipeline(
        unet_cfg=unet_lib.UNetConfig(
            in_channels=5, out_channels=4, block_out_channels=(8, 16),
            down_block_has_attn=(True, False), up_block_has_attn=(False, True),
            layers_per_block=2, cross_attention_dim=CTX, num_heads=2,
            norm_num_groups=4),
        unet_params=convert.convert_unet(unet_t.state_dict()),
        blobnet_cfg=blobnet_lib.BlobNetConfig(
            in_channels=4, conditioning_channels=1 + DINO_C,
            block_out_channels=(8, 16), down_block_has_attn=(True, False),
            up_block_has_attn=(False, True), layers_per_block=2,
            cross_attention_dim=None, num_heads=2, norm_num_groups=4),
        blobnet_params=convert.convert_unet(blobnet_t.state_dict()),
        vae_cfg=vae_lib.VAEConfig(block_out_channels=(8, 16, 16, 16),
                                  layers_per_block=1, norm_num_groups=4),
        vae_params=convert.convert_vae(vae_t.state_dict()),
        dino_cfg=dino_lib.DINOv2Config(hidden_size=DINO_C, num_layers=2,
                                       num_heads=2, intermediate_size=32,
                                       patch_size=14, image_size=28),
        dino_params=convert.convert_dinov2(dinov2_t.state_dict()),
        dino_image_size=28)

    out = pipe(fg_image=fg_img, bg_image=bg_img, gs_score=np.asarray(gs),
               height=H, width=W, num_inference_steps=steps,
               guidance_scale=7.5, latents=lat0,
               prompt_embeds=pe, negative_prompt_embeds=npe,
               blobnet_conditioning_scale=1.6,
               blobnet_control_guidance_start=0.0,
               blobnet_control_guidance_end=0.9,
               scheduler="unipc").images

    assert out.shape == ref_out.shape == (1, H, W, 3)
    assert_close(out, ref_out, atol=5e-3, rtol=5e-2, name="pipeline_e2e")


@pytest.mark.slow
def test_pipeline_ddim_and_multisample_parity():
    """Same stacks as above but with DDIM and num_images_per_prompt=2 —
    covers scheduler dispatch and CFG batch semantics vs torch."""
    from PIL import Image
    import_diffusers()
    from diffusers import DDIMScheduler
    unet_t, blobnet_t, vae_t, dinov2_t, dproc, _, text_t = build_torch_models()
    sched_t = DDIMScheduler(beta_start=0.00085, beta_end=0.012,
                            beta_schedule="scaled_linear", steps_offset=1,
                            clip_sample=False, set_alpha_to_one=False)

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import blobctrl.pipelines.pipeline_blobnet as ref_pipe_mod
    ref_pipe = ref_pipe_mod.StableDiffusionBlobNetPipeline(
        vae=vae_t, unet=unet_t, tokenizer=None, text_encoder=text_t,
        blobnet=blobnet_t, scheduler=sched_t, safety_checker=None,
        dinov2_processor=dproc, dinov2=dinov2_t,
        requires_safety_checker=False)

    from diffusers.models.autoencoders.vae import DiagonalGaussianDistribution
    orig_sample = DiagonalGaussianDistribution.sample
    DiagonalGaussianDistribution.sample = lambda self, generator=None: self.mode()

    steps = 3
    nipp = 2
    fg_img = Image.fromarray(RNG.randint(0, 255, (H, W, 3), dtype=np.uint8))
    bg_img = Image.fromarray(RNG.randint(0, 255, (H, W, 3), dtype=np.uint8))
    from blobctrl_tpu.blob import math as blob_math
    gs = blob_math.blob_score_from_ellipse(((30., 34.), (24., 30.), 10.), W, H,
                                           (LH, LW))
    gs_nchw = np.moveaxis(np.asarray(gs), -1, 1)
    pe = RNG.randn(1, 7, CTX).astype(np.float32)
    npe = RNG.randn(1, 7, CTX).astype(np.float32)
    lat0 = RNG.randn(nipp, 4, LH, LW).astype(np.float32)

    try:
        with torch.no_grad():
            ref_out = ref_pipe(
                prompt=None, fg_image=fg_img, bg_image=bg_img,
                gs_score=torch.from_numpy(gs_nchw),
                height=H, width=W, num_inference_steps=steps,
                guidance_scale=7.5, num_images_per_prompt=nipp,
                latents=torch.from_numpy(lat0),
                prompt_embeds=torch.from_numpy(pe),
                negative_prompt_embeds=torch.from_numpy(npe),
                blobnet_conditioning_scale=1.2,
                output_type="np", return_dict=False)[0]
    finally:
        DiagonalGaussianDistribution.sample = orig_sample

    pipe = BlobNetPipeline(
        unet_cfg=unet_lib.UNetConfig(
            in_channels=5, out_channels=4, block_out_channels=(8, 16),
            down_block_has_attn=(True, False), up_block_has_attn=(False, True),
            layers_per_block=2, cross_attention_dim=CTX, num_heads=2,
            norm_num_groups=4),
        unet_params=convert.convert_unet(unet_t.state_dict()),
        blobnet_cfg=blobnet_lib.BlobNetConfig(
            in_channels=4, conditioning_channels=1 + DINO_C,
            block_out_channels=(8, 16), down_block_has_attn=(True, False),
            up_block_has_attn=(False, True), layers_per_block=2,
            cross_attention_dim=None, num_heads=2, norm_num_groups=4),
        blobnet_params=convert.convert_unet(blobnet_t.state_dict()),
        vae_cfg=vae_lib.VAEConfig(block_out_channels=(8, 16, 16, 16),
                                  layers_per_block=1, norm_num_groups=4),
        vae_params=convert.convert_vae(vae_t.state_dict()),
        dino_cfg=dino_lib.DINOv2Config(hidden_size=DINO_C, num_layers=2,
                                       num_heads=2, intermediate_size=32,
                                       patch_size=14, image_size=28),
        dino_params=convert.convert_dinov2(dinov2_t.state_dict()),
        dino_image_size=28)

    out = pipe(fg_image=fg_img, bg_image=bg_img, gs_score=np.asarray(gs),
               height=H, width=W, num_inference_steps=steps,
               guidance_scale=7.5, num_images_per_prompt=nipp,
               latents=lat0, prompt_embeds=pe, negative_prompt_embeds=npe,
               blobnet_conditioning_scale=1.2, scheduler="ddim").images
    assert out.shape == ref_out.shape == (nipp, H, W, 3)
    assert_close(out, ref_out, atol=5e-3, rtol=5e-2, name="pipeline_ddim_ms")


@pytest.mark.slow
def test_blobnet_guess_mode_parity():
    unet_t, blobnet_t, *_ = build_torch_models()
    params = convert.convert_unet(blobnet_t.state_dict())
    cfg = blobnet_lib.BlobNetConfig(
        in_channels=4, conditioning_channels=1 + DINO_C,
        block_out_channels=(8, 16), down_block_has_attn=(True, False),
        up_block_has_attn=(False, True), layers_per_block=2,
        cross_attention_dim=None, num_heads=2, norm_num_groups=4)
    x = RNG.randn(1, 4 + 1 + DINO_C, 8, 16).astype(np.float32)
    with torch.no_grad():
        rd, rm, ru = blobnet_t(torch.from_numpy(x), 7, conditioning_scale=1.3,
                               guess_mode=True, return_dict=False)
    gd, gm, gu = blobnet_lib.blobnet_apply(
        params, cfg, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.asarray(7), conditioning_scale=1.3, guess_mode=True)
    for i, (g, r) in enumerate(zip(gd, rd)):
        assert_close(np.transpose(np.asarray(g), (0, 3, 1, 2)), r.numpy(),
                     atol=2e-4, rtol=2e-2, name=f"guess_down[{i}]")
    assert_close(np.transpose(np.asarray(gm), (0, 3, 1, 2)), rm.numpy(),
                 atol=2e-4, rtol=2e-2, name="guess_mid")
    for i, (g, r) in enumerate(zip(gu, ru)):
        assert_close(np.transpose(np.asarray(g), (0, 3, 1, 2)), r.numpy(),
                     atol=2e-4, rtol=2e-2, name=f"guess_up[{i}]")
