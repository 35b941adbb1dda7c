#!/usr/bin/env bash
# Re-evaluate the round-2 matched-budget (24k-step) nested-task checkpoints
# at test-split n=256 (VERDICT round-2 #6: the 32-image statistics were too
# small; the reference protocol evaluates ~1700 images,
# phiseg_test_quantitative.py:39). Deterministic split growth: the original
# 32 images are a prefix of the 256.
set -euo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
export PHISEG_LOG_ROOT="${PHISEG_LOG_ROOT:-${REPO_ROOT}/logs}"

L() { echo "${PHISEG_LOG_ROOT}/$1/$2"; }
for EXP in phiseg_7_5_synth probunet_synth phiseg_7_1_synth detunet_synth; do
  DIRN="lidc_synth"; [ "${EXP}" = "detunet_synth" ] && DIRN="lidc2_synth"
  python -m phiseg_tpu.cli.test_quantitative "$(L ${DIRN} ${EXP})" --samples 50 --batch 8 --synth-n-test 256
  python -m phiseg_tpu.cli.test_predictions "$(L ${DIRN} ${EXP})" --samples 100 --batch 8 --synth-n-test 256
done

P75="$(L lidc_synth phiseg_7_5_synth)"
python -m phiseg_tpu.cli.eval_plots ged \
  --files "${P75}/ged50_best_ged.npz" "$(L lidc_synth probunet_synth)/ged50_best_ged.npz" "$(L lidc_synth phiseg_7_1_synth)/ged50_best_ged.npz" "$(L lidc2_synth detunet_synth)/ged50_best_ged.npz" \
  --names phiseg_7_5 probunet phiseg_7_1 detunet --plot "${REPO_ROOT}/artifacts/ged_comparison.png"
python -m phiseg_tpu.cli.eval_plots ncc \
  --files "${P75}/ncc50_best_ged.npz" "$(L lidc_synth probunet_synth)/ncc50_best_ged.npz" "$(L lidc_synth phiseg_7_1_synth)/ncc50_best_ged.npz" "$(L lidc2_synth detunet_synth)/ncc50_best_ged.npz" \
  --names phiseg_7_5 probunet phiseg_7_1 detunet --plot "${REPO_ROOT}/artifacts/ncc_comparison.png"
python -m phiseg_tpu.cli.eval_plots dice \
  --files "${P75}/dice_best_dice.npz" "$(L lidc_synth probunet_synth)/dice_best_dice.npz" "$(L lidc_synth phiseg_7_1_synth)/dice_best_dice.npz" "$(L lidc2_synth detunet_synth)/dice_best_dice.npz" \
  --names phiseg_7_5 probunet phiseg_7_1 detunet --plot "${REPO_ROOT}/artifacts/dice_comparison.png"
echo "n256 re-eval complete"
