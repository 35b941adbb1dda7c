#!/usr/bin/env bash
# Re-evaluate the round-2 matched-budget (24k-step) nested-task checkpoints
# at test-split n=256 (VERDICT round-2 #6: the 32-image statistics were too
# small; the reference protocol evaluates ~1700 images,
# phiseg_test_quantitative.py:39). Deterministic split growth: the original
# 32 images are a prefix of the 256.
#
# Skip guards are SHAPE-aware: the old n=32 npz files exist under the same
# names and must be overwritten, so an eval is "done" only when its npz
# holds >= NIMG rows (keyed on ncc/dice, the last-written artifacts).
set -euo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
export PHISEG_LOG_ROOT="${PHISEG_LOG_ROOT:-${REPO_ROOT}/logs}"
NIMG=256

done_npz() {  # done_npz <file> -> success if file exists with >= NIMG rows
  [ -f "$1" ] && python - "$1" "${NIMG}" <<'EOF'
import sys
import numpy as np
with np.load(sys.argv[1]) as z:
    arr = z["arr_0"] if "arr_0" in z else z[list(z.keys())[0]]
sys.exit(0 if arr.shape[0] >= int(sys.argv[2]) else 1)
EOF
}

L() { echo "${PHISEG_LOG_ROOT}/$1/$2"; }
for EXP in phiseg_7_5_synth probunet_synth phiseg_7_1_synth detunet_synth; do
  DIRN="lidc_synth"; [ "${EXP}" = "detunet_synth" ] && DIRN="lidc2_synth"
  D="$(L ${DIRN} ${EXP})"
  done_npz "${D}/ncc50_best_ged.npz" || \
    python -m phiseg_tpu.cli.test_quantitative "${D}" --samples 50 --batch 8 --synth-n-test "${NIMG}"
  done_npz "${D}/dice_best_dice.npz" || \
    python -m phiseg_tpu.cli.test_predictions "${D}" --samples 100 --batch 8 --synth-n-test "${NIMG}"
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
