#!/usr/bin/env bash
# Round-3: matched-budget results for the single-annotator experiment trio
# (the reference's paper ablation that hierarchy helps even with ONE rater;
# /root/reference/phiseg/experiments/phiseg_7_5_1annot.py:42
# annotator_range=[0]). Runs on the nested synthetic task at the same budget
# as the round-2 4-family table so all 7 rows are comparable.
# NOTE: evals use all 4 annotators as GT (the reference protocol -- training
# sees only annotator 0, GED/NCC still measure against the full rater
# distribution, phiseg_test_quantitative.py:57-64).
set -euo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
export PHISEG_LOG_ROOT="${PHISEG_LOG_ROOT:-${REPO_ROOT}/logs}"
STEPS="${1:-24000}"

for EXP in phiseg_7_5_1annot_synth phiseg_7_1_1annot_synth probunet_1annot_synth; do
  python -m phiseg_tpu.cli.train "${EXP}" --num-iter "${STEPS}" \
    --no-image-summaries --no-histogram-summaries
done

L="${PHISEG_LOG_ROOT}/lidc_synth"
# guards key on the LAST-written artifact (ncc for quant evals) so a kill
# between the two npz writes re-runs; relaunches skip completed evals.
for EXP in phiseg_7_5_1annot_synth phiseg_7_1_1annot_synth probunet_1annot_synth; do
  [ -f "${L}/${EXP}/ncc50_best_ged.npz" ] || \
    python -m phiseg_tpu.cli.test_quantitative "${L}/${EXP}" --samples 50 --batch 8 --synth-n-test 256
  [ -f "${L}/${EXP}/dice_best_dice.npz" ] || \
    python -m phiseg_tpu.cli.test_predictions "${L}/${EXP}" --samples 100 --batch 8 --synth-n-test 256
done
echo "1annot runs complete"
