#!/usr/bin/env bash
# Stage-2 diffusion training (reference: scripts/dist_train_generation.sh).
set -euo pipefail
CONFIG=${1:-configs/generation/ge_indoor_unfreeze_enc_ints_only.yml}
python -m rald_tpu.cli.main_generation --config "$CONFIG"
