#!/usr/bin/env bash
# Round-4 convergence rerun (VERDICT r3 "Next round" #7): reproduce the
# archived CURVES.md recipe end-to-end and extend stage-2 to 480 epochs so
# the int8 quantized-inference gate can be re-anchored on a CONVERGED
# checkpoint (the round-3 gate used the epoch-119 rerun checkpoint).
#
# Identical training stream to scripts/curves_configs.py (seed 0; the
# round-3 rerun replayed the archived curve to measurement precision,
# CURVES.md "Reproducibility") — only the EVAL cadence and checkpoint
# cadence are changed, which do not touch the train-side RNG/data order:
#   - train.epochs 120 -> 480
#   - train.eval_freq 4 -> 16   (eval is pure readout)
#   - train.save_ckpt_freq 40 (checkpoint-119/…/checkpoint-479 retained)
set -euo pipefail
ROOT=${1:-/tmp/curves}
cd "$(dirname "$0")/.."
# keep the axon site dir on the path (the TPU backend registers from there)
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

python scripts/curves_configs.py "$ROOT"

python - "$ROOT" <<'EOF'
import sys, yaml
from pathlib import Path
root = Path(sys.argv[1])
gen = yaml.safe_load((root / "gen.yml").read_text())
gen["train"]["epochs"] = 480
gen["train"]["eval_freq"] = 16
gen["train"]["save_ckpt_freq"] = 40
(root / "gen.yml").write_text(yaml.safe_dump(gen))
print("patched", root / "gen.yml")
EOF

python -m rald_tpu.cli.main_ae --config "$ROOT/ae.yml"
python -m rald_tpu.cli.main_cache --config "$ROOT/gen.yml"
python -m rald_tpu.cli.main_generation --config "$ROOT/gen.yml"
