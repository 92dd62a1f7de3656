#!/usr/bin/env bash
# Interactive Gradio demo (reference scripts/run_app.sh equivalent).
set -e
python -m blobctrl_tpu.apps.gradio_app "$@"
