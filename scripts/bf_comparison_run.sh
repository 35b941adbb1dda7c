#!/usr/bin/env bash
# Round-4 quality benchmark: matched-budget 4-family comparison on the
# BOUNDARY-FIELD synthetic task (data/synthetic.py
# make_boundary_field_arrays) -- the decisive regime for the reference's
# headline claim "PHiSeg > ProbUNet on GED^2/S_NCC" (README.md:53-54):
# each annotator displaces the lesion boundary by a smooth random 8x8
# threshold field, 64 conditional dims per annotator, beyond a zdim=6
# global latent's support (DESIGN.md "counting dimensions"). Training is
# interruptible: cli.train auto-resumes from the latest checkpoint and
# exits immediately when already at --num-iter. Test split n=256, eval
# protocol per the reference (GED/NCC @ 50 samples from best_ged, Dice of
# mean softmax over 100 samples from best_dice;
# phiseg_test_quantitative.py:24, phiseg_test_predictions.py:40).
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
  python -m phiseg_tpu.cli.test_quantitative "$(L ${DIRN} ${EXP})" --samples 50 --batch 8 --max-images 128
  python -m phiseg_tpu.cli.test_predictions "$(L ${DIRN} ${EXP})" --samples 100 --batch 8 --max-images 128
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
