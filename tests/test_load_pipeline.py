"""End-to-end checkpoint loading: build a complete fake checkpoint directory
(tiny torch models saved in the reference's exact layout + formats) and load
it with params_io.load_pipeline, then run an edit."""

import json
import os

import numpy as np
import pytest

import jax

from blobctrl_tpu.params import io as params_io
from tests.oracles import import_diffusers, REFERENCE_ROOT

torch = pytest.importorskip("torch")

CTX = 16
DINO_C = 16


@pytest.fixture(scope="module")
def fake_models_root(tmp_path_factory):
    from tests.fake_checkpoint import build_fake_models_root
    return build_fake_models_root(tmp_path_factory.mktemp("models"))



@pytest.mark.slow
def test_load_pipeline_and_run(fake_models_root):
    import jax.numpy as jnp
    import dataclasses
    pipe = params_io.load_pipeline(fake_models_root, dtype=jnp.float32)
    # configs came from the on-disk config.json files
    assert pipe.unet_cfg.block_out_channels == (8, 16)
    assert pipe.unet_cfg.in_channels == 5  # widened at load
    assert pipe.blobnet_cfg.conditioning_channels == 1 + DINO_C
    assert pipe.tokenizer is not None

    # LoRA was fused: conv_in widened with zeros beyond channel 4
    k = np.asarray(pipe.unet_params["conv_in"]["kernel"])
    assert k.shape[2] == 5 and np.all(k[:, :, 4, :] == 0)

    # dino config came from disk; the INPUT size came from the processor
    # config (preprocessor_config.json), not the model config
    assert pipe.dino_cfg.hidden_size == DINO_C
    assert pipe.dino_image_size == 28

    rng = np.random.RandomState(0)
    fg = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    gs = np.stack([np.ones((1, 8, 8)), rng.rand(1, 8, 8)], -1).astype(np.float32)
    out = pipe(prompt="hello world", fg_image=fg, bg_image=fg, gs_score=gs,
               height=64, width=64, num_inference_steps=2).images
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out).all()

    # the adapter is recorded for runtime rescaling
    # (cross_attention_kwargs={"scale": s} -> set_lora_scale)
    assert pipe._lora_tree and pipe._lora_scale == 1.0
    lora_key = next(iter(pipe._lora_tree))
    path = [int(p) if p.isdigit() else p for p in lora_key.split("/")]

    def get_kernel():
        node = pipe.unet_params
        for p in path:
            node = node[p]
        return np.asarray(node["kernel"])

    raw_unet = params_io.load_sd15_unet(
        os.path.join(fake_models_root, "stable-diffusion-v1-5", "unet"))
    node = raw_unet
    for p in path:
        node = node[p]
    pristine = np.asarray(node["kernel"])
    merged = get_kernel()
    assert np.abs(merged - pristine).max() > 0  # adapter is nonzero
    pipe.set_lora_scale(0.0)
    np.testing.assert_allclose(get_kernel(), pristine, rtol=1e-5, atol=1e-6)
    pipe.set_lora_scale(1.0)
    np.testing.assert_allclose(get_kernel(), merged, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_conv_shaped_lora_recognized_and_merged(fake_models_root):
    """Checkpoint-day drill: the PEFT dict carries 4-D (r,in,1,1)/(out,r,1,1)
    conv adapters (proj_in/proj_out) — they must convert and merge onto the
    HWIO 1x1-conv kernels, matching torch's conv composition."""
    from blobctrl_tpu.models import lora as lora_lib
    lora_tree, alpha = params_io.load_lora_dir(
        os.path.join(fake_models_root, "BlobCtrl", "unet_lora"))
    conv_keys = [k for k in lora_tree
                 if "attentions" in k and k.split("/")[-1] in
                 ("proj_in", "proj_out")]
    assert conv_keys, f"no conv-shaped adapters recognized: {list(lora_tree)}"
    ff_keys = [k for k in lora_tree if "/ff/" in k]
    assert ff_keys, "GEGLU feed-forward adapters missing"
    out_keys = [k for k in lora_tree if k.endswith("to_out")]
    assert out_keys, "to_out adapters missing"

    unet = params_io.load_sd15_unet(
        os.path.join(fake_models_root, "stable-diffusion-v1-5", "unet"))
    merged = lora_lib.merge_lora(unet, lora_tree, scale=1.0, alpha=alpha)
    path = [int(p) if p.isdigit() else p for p in conv_keys[0].split("/")]
    node_before, node_after = unet, merged
    for p in path:
        node_before, node_after = node_before[p], node_after[p]
    k0, k1 = np.asarray(node_before["kernel"]), np.asarray(node_after["kernel"])
    assert k0.shape == k1.shape and k0.ndim == 4
    ab = lora_tree[conv_keys[0]]
    expected = k0 + np.asarray(ab["A"] @ ab["B"])[None, None]
    np.testing.assert_allclose(k1, expected, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_load_sam_from_download_layout(fake_models_root):
    """SAM loads from the exact download-layout pickle path and produces a
    point->mask through the predictor (the demo's click path)."""
    from blobctrl_tpu.models import sam as sam_lib
    params = params_io.load_sam(
        os.path.join(fake_models_root, "sam", "sam_vit_h_4b8939.pth"))
    jcfg = sam_lib.SAMConfig(
        hidden_size=32, num_layers=2, num_heads=2, mlp_dim=64, patch_size=16,
        image_size=64, window_size=2, global_attn_indexes=(1,),
        output_channels=16, prompt_dim=16, decoder_heads=2,
        decoder_mlp_dim=32)
    pred = sam_lib.SamPredictor(params, jcfg)
    img = np.random.RandomState(0).randint(0, 255, (48, 56, 3)).astype(np.uint8)
    pred.set_image(img)
    mask, score, _ = pred.predict(np.array([[20, 20]]), np.array([1]))
    # (num_masks, H, W) with multimask_output=False -> one mask
    assert mask.shape == (1,) + img.shape[:2] and np.isfinite(score).all()
