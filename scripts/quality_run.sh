#!/usr/bin/env bash
# End-to-end quality run on the synthetic LIDC-shaped dataset: train the
# flagship phiseg_7_5 (full R=7/L=5 hierarchy at 128x128), then run the
# quantitative (GED/NCC), prediction (Dice) and qualitative CLIs on the
# best checkpoints. Artifacts land in $PHISEG_LOG_ROOT/lidc_synth/phiseg_7_5_synth.
set -euo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
export PHISEG_LOG_ROOT="${PHISEG_LOG_ROOT:-${REPO_ROOT}/logs}"

STEPS="${1:-4000}"
LOG_DIR="${PHISEG_LOG_ROOT}/lidc_synth/phiseg_7_5_synth"

python -m phiseg_tpu.cli.train phiseg_7_5_synth --num-iter "${STEPS}"
python -m phiseg_tpu.cli.test_quantitative "${LOG_DIR}" --samples 50 --batch 8
python -m phiseg_tpu.cli.test_predictions "${LOG_DIR}" --samples 100 --batch 8
python -m phiseg_tpu.cli.generate_samples "${LOG_DIR}" --samples 100 --indices 0 1 2
python -m phiseg_tpu.cli.sample_construction "${LOG_DIR}" --indices 0
python -m phiseg_tpu.cli.makegif_samples "${LOG_DIR}" --samples 20 --indices 0
echo "quality run complete: ${LOG_DIR}"
