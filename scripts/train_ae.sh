#!/usr/bin/env bash
# Stage-1 VAE training (reference: scripts/dist_train_ae.sh, minus torchrun:
# one process per host drives every local chip; multi-host rendezvous via
# JAX_COORDINATOR_ADDRESS / RANK / WORLD_SIZE env vars).
set -euo pipefail
CONFIG=${1:-configs/ae/ae_indoor_aniso_mix_view_cone.yml}
python -m rald_tpu.cli.main_ae --config "$CONFIG"
