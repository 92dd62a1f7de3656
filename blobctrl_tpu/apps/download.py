"""Checkpoint downloader — the reference's asset tooling
(/root/reference/scripts/download_models.py:15-106) re-expressed for this
framework's loader layout (params/io.py expects the same directory layout).

Requires network access + huggingface_hub; in air-gapped environments place
the checkpoints manually:

  models/
    stable-diffusion-v1-5/{unet,vae,text_encoder,tokenizer,scheduler}/
    BlobCtrl/{blobnet,unet_lora}/
    dinov2-large/
    sam/sam_vit_h_4b8939.pth
"""

from __future__ import annotations

import argparse
import os

SD15_REPO = "sd-legacy/stable-diffusion-v1-5"
BLOBCTRL_REPO = "Yw22/BlobCtrl"
DINOV2_REPO = "facebook/dinov2-large"
SAM_URL = "https://dl.fbaipublicfiles.com/segment_anything/sam_vit_h_4b8939.pth"

SD15_PATTERNS = ["unet/*", "vae/*", "text_encoder/*", "tokenizer/*",
                 "scheduler/*", "model_index.json", "*.json"]


def download_all(models_root: str = "models"):
    try:
        from huggingface_hub import snapshot_download, hf_hub_download
    except ImportError as e:
        raise SystemExit(f"huggingface_hub unavailable ({e}); place checkpoints "
                         f"manually per the layout in this module's docstring")

    os.makedirs(models_root, exist_ok=True)
    snapshot_download(SD15_REPO, allow_patterns=SD15_PATTERNS,
                      local_dir=os.path.join(models_root, "stable-diffusion-v1-5"))
    snapshot_download(BLOBCTRL_REPO,
                      local_dir=os.path.join(models_root, "BlobCtrl"))
    snapshot_download(DINOV2_REPO,
                      local_dir=os.path.join(models_root, "dinov2-large"))
    sam_dir = os.path.join(models_root, "sam")
    os.makedirs(sam_dir, exist_ok=True)
    target = os.path.join(sam_dir, "sam_vit_h_4b8939.pth")
    if not os.path.exists(target):
        import urllib.request
        urllib.request.urlretrieve(SAM_URL, target)
    print(f"checkpoints ready under {models_root}/")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--models_root", default="models")
    args = p.parse_args()
    download_all(args.models_root)


if __name__ == "__main__":
    main()
