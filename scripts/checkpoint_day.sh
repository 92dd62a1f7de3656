#!/usr/bin/env bash
# Checkpoint day, one command (VERDICT r4 Next #5): download the published
# checkpoints, drill the loader, replay + score all 9 recorded demo states
# (exact and under every opt-in fast mode), and write the PSNR report.
# Reference tooling being replaced: scripts/download_models.py + the manual
# gallery comparison against assets/results/demo/*/results_gallery/.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m blobctrl_tpu.apps.checkpoint_day \
  --models_root "${MODELS_ROOT:-models}" \
  --demo_root "${DEMO_ROOT:-assets/results/demo}" \
  --json_out "${JSON_OUT:-checkpoint_day.json}" \
  "$@"
