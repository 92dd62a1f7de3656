#!/usr/bin/env bash
# One edit from the CLI (reference scripts/inference.sh equivalent).
set -e
python -m blobctrl_tpu.apps.cli "$@"
