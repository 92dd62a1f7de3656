"""CLIP vision + safety checker parity vs transformers/diffusers oracles."""

import numpy as np
import pytest

import jax.numpy as jnp

from blobctrl_tpu.models import clip_vision, safety_checker
from tests.oracles import assert_close, import_diffusers, nchw_to_nhwc

torch = pytest.importorskip("torch")

RNG = np.random.RandomState(13)


def tiny_vision_cfg_pair():
    from transformers import CLIPVisionModel, CLIPVisionConfig
    torch.manual_seed(0)
    tcfg = CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                            num_hidden_layers=2, num_attention_heads=2,
                            image_size=28, patch_size=14)
    tmodel = CLIPVisionModel(tcfg).eval()
    jcfg = clip_vision.CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                                        num_layers=2, num_heads=2,
                                        image_size=28, patch_size=14)
    return tmodel, jcfg


@pytest.mark.slow
def test_clip_vision_parity():
    tmodel, jcfg = tiny_vision_cfg_pair()
    params = safety_checker.convert_clip_vision(tmodel.state_dict())
    px = RNG.randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        out = tmodel(torch.from_numpy(px))
    hs, pooled = clip_vision.apply(params, jcfg, jnp.asarray(nchw_to_nhwc(px)))
    assert_close(np.asarray(hs), out.last_hidden_state.numpy(), atol=2e-4,
                 rtol=2e-3, name="clip_vision_hidden")
    assert_close(np.asarray(pooled), out.pooler_output.numpy(), atol=2e-4,
                 rtol=2e-3, name="clip_vision_pooled")


def test_safety_checker_parity():
    import_diffusers()
    from diffusers.pipelines.stable_diffusion.safety_checker import (
        StableDiffusionSafetyChecker)
    from transformers import CLIPVisionConfig, CLIPConfig
    torch.manual_seed(1)
    vc = CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                          num_hidden_layers=2, num_attention_heads=2,
                          image_size=28, patch_size=14, projection_dim=8)
    cfg = CLIPConfig(projection_dim=8)
    cfg.vision_config = vc
    tchecker = StableDiffusionSafetyChecker(cfg).eval()
    with torch.no_grad():
        tchecker.concept_embeds.copy_(torch.randn_like(tchecker.concept_embeds))
        tchecker.special_care_embeds.copy_(torch.randn_like(tchecker.special_care_embeds))
        tchecker.concept_embeds_weights.fill_(0.5)
        tchecker.special_care_embeds_weights.fill_(0.5)

    params = safety_checker.convert_safety_checker(tchecker.state_dict())
    jcfg = clip_vision.CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                                        num_layers=2, num_heads=2,
                                        image_size=28, patch_size=14)

    # bypass image preprocessing in both stacks: feed clip_input directly
    clip_in = RNG.randn(3, 3, 28, 28).astype(np.float32)
    imgs = RNG.rand(3, 28, 28, 3).astype(np.float32)
    with torch.no_grad():
        _, ref_flags = tchecker(images=torch.from_numpy(imgs),
                                clip_input=torch.from_numpy(clip_in))

    _, pooled = clip_vision.apply(params["vision"], jcfg,
                                  jnp.asarray(nchw_to_nhwc(clip_in)))
    from blobctrl_tpu.nn import layers
    embeds = layers.linear(params["visual_projection"], pooled)
    special = safety_checker._cosine(embeds, params["special_care_embeds"])
    concept = safety_checker._cosine(embeds, params["concept_embeds"])
    special_scores = special - params["special_care_embeds_weights"][None]
    adjust = jnp.where(jnp.any(special_scores > 0, -1, keepdims=True), 0.01, 0.0)
    got_flags = np.asarray(jnp.any(
        concept - params["concept_embeds_weights"][None] + adjust > 0, -1))
    assert list(got_flags) == list(np.asarray(ref_flags))
