#!/usr/bin/env bash
# Boundary-field ambiguity benchmark: matched-budget 4-family comparison on
# the task whose annotator disagreement is a smooth random 8x8 threshold
# FIELD (64 conditional dims/annotator; data/synthetic.py
# make_boundary_field_arrays) -- ambiguity a zdim=6 global latent cannot
# cover but PHiSeg's spatial latent grids are shaped for. Same protocol as
# scripts/ms_comparison_run.sh: n_test=256, GED/NCC @ 50 samples from
# best_ged, Dice of mean softmax over 100 samples from best_dice
# (ref phiseg_test_quantitative.py:24, phiseg_test_predictions.py:40).
set -euo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
export PHISEG_LOG_ROOT="${PHISEG_LOG_ROOT:-${REPO_ROOT}/logs}"
STEPS="${1:-24000}"

for EXP in phiseg_7_5_bf probunet_bf phiseg_7_1_bf detunet_bf; do
  python -m phiseg_tpu.cli.train "${EXP}" --num-iter "${STEPS}" \
    --no-image-summaries --no-histogram-summaries
done

L() { echo "${PHISEG_LOG_ROOT}/$1/$2"; }
for EXP in phiseg_7_5_bf probunet_bf phiseg_7_1_bf detunet_bf; do
  DIRN="lidc_bf"; [ "${EXP}" = "detunet_bf" ] && DIRN="lidc2_bf"
  python -m phiseg_tpu.cli.test_quantitative "$(L ${DIRN} ${EXP})" --samples 50 --batch 8
  python -m phiseg_tpu.cli.test_predictions "$(L ${DIRN} ${EXP})" --samples 100 --batch 8
done

P75="$(L lidc_bf phiseg_7_5_bf)"
python -m phiseg_tpu.cli.eval_plots ged \
  --files "${P75}/ged50_best_ged.npz" "$(L lidc_bf probunet_bf)/ged50_best_ged.npz" "$(L lidc_bf phiseg_7_1_bf)/ged50_best_ged.npz" "$(L lidc2_bf detunet_bf)/ged50_best_ged.npz" \
  --names phiseg_7_5 probunet phiseg_7_1 detunet --plot "${REPO_ROOT}/artifacts/ged_bf_comparison.png"
python -m phiseg_tpu.cli.eval_plots ncc \
  --files "${P75}/ncc50_best_ged.npz" "$(L lidc_bf probunet_bf)/ncc50_best_ged.npz" "$(L lidc_bf phiseg_7_1_bf)/ncc50_best_ged.npz" "$(L lidc2_bf detunet_bf)/ncc50_best_ged.npz" \
  --names phiseg_7_5 probunet phiseg_7_1 detunet --plot "${REPO_ROOT}/artifacts/ncc_bf_comparison.png"
python -m phiseg_tpu.cli.eval_plots dice \
  --files "${P75}/dice_best_dice.npz" "$(L lidc_bf probunet_bf)/dice_best_dice.npz" "$(L lidc_bf phiseg_7_1_bf)/dice_best_dice.npz" "$(L lidc2_bf detunet_bf)/dice_best_dice.npz" \
  --names phiseg_7_5 probunet phiseg_7_1 detunet --plot "${REPO_ROOT}/artifacts/dice_bf_comparison.png"
echo "bf comparison complete"
