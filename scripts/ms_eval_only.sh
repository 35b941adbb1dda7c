#!/usr/bin/env bash
# Test-protocol evals for the already-trained multiscale quartet (the
# training half of ms_comparison_run.sh finished in round 3; its eval half
# was lost to a TPU-tunnel outage at round end). GED/NCC @ 50 samples from
# best_ged, Dice of mean softmax over 100 samples from best_dice
# (phiseg_test_quantitative.py:24, phiseg_test_predictions.py:40);
# --max-images caps to a prefix of the deterministic 256-image split.
set -euo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
export PHISEG_LOG_ROOT="${PHISEG_LOG_ROOT:-${REPO_ROOT}/logs}"
NIMG="${1:-256}"

L() { echo "${PHISEG_LOG_ROOT}/$1/$2"; }
# skip-if-done guards key on the LAST-written artifact (test_quantitative
# writes ged then ncc): a kill between the two writes re-runs the eval, so
# a killed/resumed chain re-runs only what's actually incomplete.
for EXP in phiseg_7_5_ms probunet_ms phiseg_7_1_ms detunet_ms; do
  DIRN="lidc_ms"; [ "${EXP}" = "detunet_ms" ] && DIRN="lidc2_ms"
  D="$(L ${DIRN} ${EXP})"
  [ -f "${D}/ncc50_best_ged.npz" ] || \
    python -m phiseg_tpu.cli.test_quantitative "${D}" --samples 50 --batch 8 --max-images "${NIMG}"
  [ -f "${D}/dice_best_dice.npz" ] || \
    python -m phiseg_tpu.cli.test_predictions "${D}" --samples 100 --batch 8 --max-images "${NIMG}"
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
echo "ms eval complete"
