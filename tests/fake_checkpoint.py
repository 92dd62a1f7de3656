"""Fabricate a complete reference-layout checkpoint directory at tiny
geometry: SD-1.5 (unet/vae/text_encoder/tokenizer), BlobCtrl
(blobnet + PEFT unet_lora), dinov2-large, and SAM — saved in the exact
formats and key layouts the published checkpoints ship in
(/root/reference/scripts/download_models.py layout; torch-format weights
exercise every converter in params/convert.py).

Shared by tests/test_load_pipeline.py (loader drill) and
tests/test_launch_rehearsal.py (full launch-day path: train-step export ->
fabricated models_root -> load_pipeline -> replay --all --score).
"""

import json

import torch

CTX = 16
DINO_C = 16


def build_fake_models_root(root) -> str:
    """root: a pathlib.Path-like directory to populate. Returns str(root)."""
    from tests.oracles import import_diffusers, REFERENCE_ROOT
    import_diffusers()
    import sys
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from diffusers import AutoencoderKL, UNet2DConditionModel
    from transformers import (CLIPTextModel, CLIPTextConfig, Dinov2Model,
                              Dinov2Config)
    import blobctrl.models.blobnet as ref_blobnet_mod
    from safetensors.torch import save_file

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
    # processor config, as the real download ships it (load_pipeline reads
    # the crop size from here — the model config's image_size is NOT the
    # input size the reference feeds, pipeline_blobnet.py:696)
    with open(root / "dinov2-large" / "preprocessor_config.json", "w") as f:
        json.dump({"crop_size": {"height": 28, "width": 28},
                   "do_center_crop": True, "do_resize": True}, f)

    return str(root)
