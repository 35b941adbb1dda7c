#!/usr/bin/env bash
# Round-3 quality benchmark: matched-budget 4-family comparison on the
# MULTI-SCALE-AMBIGUITY synthetic task (data/synthetic.py
# make_multiscale_arrays) -- the regime where the reference's headline claim
# "PHiSeg > ProbUNet on GED^2/S_NCC" (README.md:53-54) is supposed to hold.
# Test split n=256 (configs phiseg_tpu/experiments: synth_n_test=256), eval
# protocol per the reference (GED/NCC @ 50 samples from best_ged, Dice of
# mean softmax over 100 samples from best_dice; phiseg_test_quantitative.py:24,
# phiseg_test_predictions.py:40).
set -euo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
export PHISEG_LOG_ROOT="${PHISEG_LOG_ROOT:-${REPO_ROOT}/logs}"
STEPS="${1:-24000}"

for EXP in phiseg_7_5_ms probunet_ms phiseg_7_1_ms detunet_ms; do
  python -m phiseg_tpu.cli.train "${EXP}" --num-iter "${STEPS}" \
    --no-image-summaries --no-histogram-summaries
done

L() { echo "${PHISEG_LOG_ROOT}/$1/$2"; }
for EXP in phiseg_7_5_ms probunet_ms phiseg_7_1_ms detunet_ms; do
  DIRN="lidc_ms"; [ "${EXP}" = "detunet_ms" ] && DIRN="lidc2_ms"
  python -m phiseg_tpu.cli.test_quantitative "$(L ${DIRN} ${EXP})" --samples 50 --batch 8
  python -m phiseg_tpu.cli.test_predictions "$(L ${DIRN} ${EXP})" --samples 100 --batch 8
done

P75="$(L lidc_ms phiseg_7_5_ms)"
python -m phiseg_tpu.cli.eval_plots ged \
  --files "${P75}/ged50_best_ged.npz" "$(L lidc_ms probunet_ms)/ged50_best_ged.npz" "$(L lidc_ms phiseg_7_1_ms)/ged50_best_ged.npz" "$(L lidc2_ms detunet_ms)/ged50_best_ged.npz" \
  --names phiseg_7_5 probunet phiseg_7_1 detunet --plot "${REPO_ROOT}/artifacts/ged_ms_comparison.png"
python -m phiseg_tpu.cli.eval_plots ncc \
  --files "${P75}/ncc50_best_ged.npz" "$(L lidc_ms probunet_ms)/ncc50_best_ged.npz" "$(L lidc_ms phiseg_7_1_ms)/ncc50_best_ged.npz" "$(L lidc2_ms detunet_ms)/ncc50_best_ged.npz" \
  --names phiseg_7_5 probunet phiseg_7_1 detunet --plot "${REPO_ROOT}/artifacts/ncc_ms_comparison.png"
python -m phiseg_tpu.cli.eval_plots dice \
  --files "${P75}/dice_best_dice.npz" "$(L lidc_ms probunet_ms)/dice_best_dice.npz" "$(L lidc_ms phiseg_7_1_ms)/dice_best_dice.npz" "$(L lidc2_ms detunet_ms)/dice_best_dice.npz" \
  --names phiseg_7_5 probunet phiseg_7_1 detunet --plot "${REPO_ROOT}/artifacts/dice_ms_comparison.png"
echo "ms comparison complete"
