#!/usr/bin/env bash
# Cross-family comparison on the synthetic dataset: train detunet, probunet
# and phiseg_7_1 twins, evaluate GED/NCC/Dice on each, then aggregate with
# paired t-tests against phiseg_7_5 (the reference repo's eval_*_plot
# workflow, eval_ged_plot.py:8-46).
set -euo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
export PHISEG_LOG_ROOT="${PHISEG_LOG_ROOT:-${REPO_ROOT}/logs}"
STEPS="${1:-2000}"

for EXP in detunet_synth probunet_synth phiseg_7_1_synth; do
  # baselines skip the TB image/histogram diagnostics: metric selection and
  # scalar curves are unaffected, and it saves each family the multi-minute
  # per-architecture compile of the diagnostics programs on the tunnelled TPU
  python -m phiseg_tpu.cli.train "${EXP}" --num-iter "${STEPS}" \
    --no-image-summaries --no-histogram-summaries
done

L() { echo "${PHISEG_LOG_ROOT}/$1/$2"; }
for EXP in detunet_synth probunet_synth phiseg_7_1_synth; do
  DIRN="lidc_synth"; [ "${EXP}" = "detunet_synth" ] && DIRN="lidc2_synth"
  python -m phiseg_tpu.cli.test_quantitative "$(L ${DIRN} ${EXP})" --samples 50 --batch 8
  python -m phiseg_tpu.cli.test_predictions "$(L ${DIRN} ${EXP})" --samples 100 --batch 8
done

# aggregate: phiseg_7_5 vs baselines (t-tests + boxplots)
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
echo "comparison complete"
