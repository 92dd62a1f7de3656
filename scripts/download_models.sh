#!/usr/bin/env bash
# Checkpoint download (reference scripts/download_models.py wrapper).
set -e
python -m blobctrl_tpu.apps.download "$@"
