#!/usr/bin/env bash
# BlobNet + UNet-LoRA training (no reference equivalent; see train_cli.py).
set -e
python -m blobctrl_tpu.apps.train_cli "$@"
