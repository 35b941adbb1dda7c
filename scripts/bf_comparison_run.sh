#!/usr/bin/env bash
# Round-4 quality benchmark: matched-budget 4-family comparison on the
# BOUNDARY-FIELD synthetic task (data/synthetic.py
# make_boundary_field_arrays) -- the decisive regime for the reference's
# headline claim "PHiSeg > ProbUNet on GED^2/S_NCC" (README.md:53-54):
# each annotator displaces the lesion boundary by a smooth random 8x8
# threshold field, 64 conditional dims per annotator, beyond a zdim=6
# global latent's support (DESIGN.md "counting dimensions").
#
# Structure: each family trains THEN evals immediately (test split n=256,
# reference protocol: GED/NCC @ 50 samples from best_ged, Dice of mean
# softmax over 100 samples from best_dice; phiseg_test_quantitative.py:24,
# phiseg_test_predictions.py:40), with the decisive pair
# (phiseg_7_5 vs probunet) FIRST -- so an interruption at any point leaves
# completed families fully evaluated rather than round 3's
# all-trained/none-evaled state. cli.train auto-resumes and exits
# immediately when already at --num-iter; eval guards key on the
# LAST-written artifact (ncc for quant evals) so a kill between the two
# npz writes re-runs the eval. The plot tail aggregates whichever
# families completed (>=2 required); the script fails only if the
# decisive pair is incomplete.
set -uo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
export PHISEG_LOG_ROOT="${PHISEG_LOG_ROOT:-${REPO_ROOT}/logs}"
STEPS="${1:-24000}"
NIMG="${2:-256}"

L() { echo "${PHISEG_LOG_ROOT}/$1/$2"; }

run_family() {
  local EXP="$1" DIRN="$2"
  python -m phiseg_tpu.cli.train "${EXP}" --num-iter "${STEPS}" \
    --no-image-summaries --no-histogram-summaries || return 1
  local D; D="$(L "${DIRN}" "${EXP}")"
  [ -f "${D}/ncc50_best_ged.npz" ] || \
    python -m phiseg_tpu.cli.test_quantitative "${D}" --samples 50 --batch 8 --max-images "${NIMG}" || return 1
  [ -f "${D}/dice_best_dice.npz" ] || \
    python -m phiseg_tpu.cli.test_predictions "${D}" --samples 100 --batch 8 --max-images "${NIMG}" || return 1
}

run_family phiseg_7_5_bf lidc_bf || exit 1
run_family probunet_bf  lidc_bf || exit 1
run_family phiseg_7_1_bf lidc_bf || echo "WARN: phiseg_7_1_bf incomplete"
run_family detunet_bf   lidc2_bf || echo "WARN: detunet_bf incomplete"

# Aggregate whichever families completed (order fixed; decisive pair is
# guaranteed above). eval_plots failures must not mask the completed
# training/eval work, so the tail is best-effort.
plot() {  # plot <metric> <file-stem> <png-name>
  local METRIC="$1" STEM="$2" PNG="$3" FILES=() NAMES=()
  for ROW in "phiseg_7_5:$(L lidc_bf phiseg_7_5_bf)" \
             "probunet:$(L lidc_bf probunet_bf)" \
             "phiseg_7_1:$(L lidc_bf phiseg_7_1_bf)" \
             "detunet:$(L lidc2_bf detunet_bf)"; do
    local NAME="${ROW%%:*}" DIR="${ROW#*:}"
    [ -f "${DIR}/${STEM}.npz" ] && { FILES+=("${DIR}/${STEM}.npz"); NAMES+=("${NAME}"); }
  done
  if [ "${#FILES[@]}" -ge 2 ]; then
    python -m phiseg_tpu.cli.eval_plots "${METRIC}" --files "${FILES[@]}" \
      --names "${NAMES[@]}" --plot "${REPO_ROOT}/artifacts/${PNG}" \
      || echo "WARN: ${METRIC} aggregation failed"
  else
    echo "WARN: <2 families have ${STEM}.npz; skipping ${METRIC} plot"
  fi
}

plot ged  ged50_best_ged  ged_bf_comparison.png
plot ncc  ncc50_best_ged  ncc_bf_comparison.png
plot dice dice_best_dice  dice_bf_comparison.png
echo "bf comparison complete"
