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
    import_diffusers()
    import sys
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from diffusers import AutoencoderKL, UNet2DConditionModel
    from transformers import (CLIPTextModel, CLIPTextConfig, Dinov2Model,
                              Dinov2Config)
    import blobctrl.models.blobnet as ref_blobnet_mod
    from safetensors.torch import save_file

    root = tmp_path_factory.mktemp("models")
    torch.manual_seed(0)

    def save_model(model, subdir, name="diffusion_pytorch_model.safetensors",
                   config=None):
        d = root / subdir
        d.mkdir(parents=True, exist_ok=True)
        save_file({k: v.contiguous() for k, v in model.state_dict().items()},
                  str(d / name))
        if config is not None:
            with open(d / "config.json", "w") as f:
                json.dump(config, f)

    unet = UNet2DConditionModel(
        sample_size=8, in_channels=4, out_channels=4,
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        cross_attention_dim=CTX, attention_head_dim=2, norm_num_groups=4,
        layers_per_block=2)
    save_model(unet, "stable-diffusion-v1-5/unet", config=dict(unet.config))

    vae = AutoencoderKL(in_channels=3, out_channels=3, latent_channels=4,
                        block_out_channels=(8, 16, 16, 16), layers_per_block=1,
                        norm_num_groups=4,
                        down_block_types=("DownEncoderBlock2D",) * 4,
                        up_block_types=("UpDecoderBlock2D",) * 4,
                        sample_size=64)
    save_model(vae, "stable-diffusion-v1-5/vae",
               name="diffusion_pytorch_model.safetensors",
               config=dict(vae.config))

    text = CLIPTextModel(CLIPTextConfig(
        vocab_size=512, hidden_size=CTX, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77))
    save_model(text, "stable-diffusion-v1-5/text_encoder",
               name="model.safetensors", config=text.config.to_dict())

    # tokenizer files (tiny but valid CLIP BPE)
    from blobctrl_tpu.tokenizer import clip_bpe
    tok_dir = root / "stable-diffusion-v1-5" / "tokenizer"
    tok_dir.mkdir(parents=True)
    base = list(clip_bpe.bytes_to_unicode().values())
    vocab = {}
    for ch in base:
        vocab[ch] = len(vocab)
    for ch in base:
        vocab[ch + "</w>"] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(tok_dir / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(tok_dir / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")

    blobnet = ref_blobnet_mod.BlobNetModel(
        in_channels=4, conditioning_channels=1 + DINO_C,
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        cross_attention_dim=None, attention_head_dim=2, norm_num_groups=4,
        layers_per_block=2)
    save_model(blobnet, "BlobCtrl/blobnet", config=dict(blobnet.config))

    # PEFT-format LoRA for the UNet. The published BlobCtrl adapter's target
    # set is unknowable until downloaded (SURVEY §7 "Hard parts"), so the
    # drill covers every plausible module kind: attention linears, the GEGLU
    # feed-forward linears, AND 1x1-conv-shaped 4-D tensors (proj_in/
    # proj_out when use_linear_projection=False) — PEFT stores Conv2d
    # adapters as (r, in, 1, 1)/(out, r, 1, 1).
    rank = 2
    lora_sd = {}
    for name, mod in unet.named_modules():
        if (name.endswith(("to_q", "to_k", "to_v", "to_out.0", "net.0.proj",
                           "net.2"))
                and hasattr(mod, "in_features")):
            lora_sd[f"base_model.model.{name}.lora_A.weight"] = \
                torch.randn(rank, mod.in_features) * 0.1
            lora_sd[f"base_model.model.{name}.lora_B.weight"] = \
                torch.randn(mod.out_features, rank) * 0.1
        elif (name.endswith(("proj_in", "proj_out"))
                and isinstance(mod, torch.nn.Conv2d)
                and mod.kernel_size == (1, 1)):
            lora_sd[f"base_model.model.{name}.lora_A.weight"] = \
                torch.randn(rank, mod.in_channels, 1, 1) * 0.1
            lora_sd[f"base_model.model.{name}.lora_B.weight"] = \
                torch.randn(mod.out_channels, rank, 1, 1) * 0.1
        elif (name in ("down_blocks.0.resnets.0.conv1",
                       "down_blocks.0.downsamplers.0.conv")
                and isinstance(mod, torch.nn.Conv2d)):
            # k x k conv adapters (PEFT Conv2d: lora_A is a kxk conv,
            # lora_B a 1x1) — the published adapter's targets are unknowable
            # until download, so the drill covers these too
            kh, kw = mod.kernel_size
            lora_sd[f"base_model.model.{name}.lora_A.weight"] = \
                torch.randn(rank, mod.in_channels, kh, kw) * 0.1
            lora_sd[f"base_model.model.{name}.lora_B.weight"] = \
                torch.randn(mod.out_channels, rank, 1, 1) * 0.1
    assert any(v.ndim == 4 for v in lora_sd.values()), "drill needs conv LoRA"
    lora_dir = root / "BlobCtrl" / "unet_lora"
    lora_dir.mkdir(parents=True)
    save_file(lora_sd, str(lora_dir / "adapter_model.safetensors"))
    with open(lora_dir / "adapter_config.json", "w") as f:
        json.dump({"r": rank, "lora_alpha": rank,
                   "target_modules": ["to_q", "to_k", "to_v", "to_out.0",
                                      "proj_in", "proj_out"]}, f)

    # SAM checkpoint at the download-layout path (torch pickle)
    from transformers import SamModel, SamConfig
    sam_cfg = SamConfig(
        vision_config=dict(hidden_size=32, num_hidden_layers=2,
                           num_attention_heads=2, image_size=64, patch_size=16,
                           global_attn_indexes=[1], window_size=2,
                           output_channels=16, mlp_dim=64, num_pos_feats=8),
        prompt_encoder_config=dict(hidden_size=16, image_embedding_size=4,
                                   image_size=64, mask_input_channels=4,
                                   num_pos_feats=8),
        mask_decoder_config=dict(hidden_size=16, num_attention_heads=2,
                                 iou_head_hidden_dim=16, mlp_dim=32),
    )
    sam_model = SamModel(sam_cfg).eval()
    sam_dir = root / "sam"
    sam_dir.mkdir(parents=True)
    torch.save(sam_model.state_dict(), str(sam_dir / "sam_vit_h_4b8939.pth"))

    dino = Dinov2Model(Dinov2Config(
        hidden_size=DINO_C, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=32, image_size=28, patch_size=14))
    save_model(dino, "dinov2-large", name="model.safetensors",
               config=dino.config.to_dict())

    return str(root)


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

    # dino config came from disk
    assert pipe.dino_cfg.hidden_size == DINO_C
    pipe.dino_image_size = 28

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
