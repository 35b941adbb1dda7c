#!/usr/bin/env bash
# Round-4 consolidated queue (session restart #2, 2026-08-18 ~05:35 UTC):
# merges the unfinished tail of round4_chain.sh with the reprioritised
# round4b_chain.sh into ONE global order, resumable at any point:
#   1. finish the ms decisive pair (probunet_ms died mid-train at 12001;
#      cli.train auto-resumes)
#   2. nested decisive pair (not yet retrained after the VM wipe)
#   3. bfxl pair -- decisive data-regime test (8x train data, same budget)
#   4. bf 48k extension pair (matched-budget convergence-asymmetry test)
#   5. bf fill-ins (7_1, detunet) -> complete headline-task table + plots
#   6. 1annot trio (round-2 carryover, asked twice)
#   7. ms + nested fill-ins -> complete those tables + plots
#   8. ms 48k extension (VERDICT r3 #2)
#   9. conv-layout lever sweep (VERDICT r3 #5)
# Conventions: idempotent units (train auto-resumes and exits at target;
# evals guard on their last-written npz), tunnel preflight per family,
# harvest+commit after every unit (the VM disk does not survive restarts).
# Launch:  bash scripts/chain_watch.sh scripts/round4c_chain.sh
set -o pipefail
cd "$(dirname "${BASH_SOURCE[0]}")/.."
REPO_ROOT="$(pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
export PHISEG_LOG_ROOT="${PHISEG_LOG_ROOT:-${REPO_ROOT}/logs}"
mkdir -p artifacts
STEPS="${ROUND4_STEPS:-24000}"
NIMG=256

preflight() {
  timeout -k 30 420 python -c "import jax; assert jax.devices()[0].platform=='tpu'" \
    || { echo "!!! tunnel preflight failed $(date -u +%H:%M:%S)"; exit 1; }
}
stage() { echo "=== [$1] $2 $(date -u +%H:%M:%S) ==="; preflight; }

run_fam() {
  echo "--- family $1 ($(date -u +%H:%M:%S))"
  preflight || return 1
  bash scripts/train_eval_family.sh "$1" "$2" "${STEPS}" "${NIMG}" "$3"
  local RC=$?
  bash scripts/harvest_results.sh
  return "${RC}"
}

L() { echo "${PHISEG_LOG_ROOT}/$1/$2"; }

plots() {
  local D75="$1" DPU="$2" D71="$3" DDET="$4" PREFIX="$5"
  local M
  for M in ged ncc dice; do
    local STEM="dice_best_dice"; [ "${M}" != "dice" ] && STEM="${M}50_best_ged"
    local FILES=() NAMES=()
    for ROW in "phiseg_7_5:${D75}" "probunet:${DPU}" \
               "phiseg_7_1:${D71}" "detunet:${DDET}"; do
      local NAME="${ROW%%:*}" DIR="${ROW#*:}"
      [ "${M}" = "ncc" ] && [ "${NAME}" = "detunet" ] && continue
      [ -f "${DIR}/${STEM}.npz" ] && { FILES+=("${DIR}/${STEM}.npz"); NAMES+=("${NAME}"); }
    done
    if [ "${#FILES[@]}" -ge 2 ]; then
      python -m phiseg_tpu.cli.eval_plots "${M}" --files "${FILES[@]}" \
        --names "${NAMES[@]}" --plot "${REPO_ROOT}/artifacts/${M}_${PREFIX}comparison.png" \
        || echo "WARN: ${M} ${PREFIX}aggregation failed"
    else
      echo "WARN: <2 families have ${STEM}.npz for ${PREFIX}plots"
    fi
  done
}

extend_48k() {
  local EXP="$1" DIRN="$2"
  local D; D="$(L "${DIRN}" "${EXP}")"
  [ -f "${D}/best_metrics_24k.json" ] || cp "${D}/best_metrics.json" "${D}/best_metrics_24k.json"
  python -m phiseg_tpu.cli.train "${EXP}" --num-iter 48000 \
    --no-image-summaries --no-histogram-summaries || return 1
  if [ ! -f "${D}/ncc50_best_ged_48k.npz" ]; then
    python -m phiseg_tpu.cli.test_quantitative "${D}" \
      --samples 50 --batch 8 --max-images "${NIMG}" --tag best_ged --out-suffix _48k \
      || return 1
  fi
  bash scripts/harvest_results.sh
}

stage 1/9 "finish ms decisive pair (probunet_ms resume from 12001)"
run_fam phiseg_7_5_ms lidc_ms max || exit 1
run_fam probunet_ms  lidc_ms max || exit 1
plots "$(L lidc_ms phiseg_7_5_ms)" "$(L lidc_ms probunet_ms)" \
      /nonexistent /nonexistent ms_

stage 2/9 "nested decisive pair (retrain after wipe)"
run_fam phiseg_7_5_synth lidc_synth synth || exit 1
run_fam probunet_synth  lidc_synth synth || exit 1
plots "$(L lidc_synth phiseg_7_5_synth)" "$(L lidc_synth probunet_synth)" \
      /nonexistent /nonexistent ""

stage 3/9 "bfxl decisive pair (8x data, same budget)"
run_fam phiseg_7_5_bfxl lidc_bfxl max || exit 1
run_fam probunet_bfxl  lidc_bfxl max || exit 1
plots "$(L lidc_bfxl phiseg_7_5_bfxl)" "$(L lidc_bfxl probunet_bfxl)" \
      /nonexistent /nonexistent bfxl_

stage 4/9 "bf 48k extension pair (matched-budget convergence test)"
extend_48k phiseg_7_5_bf lidc_bf || exit 1
extend_48k probunet_bf  lidc_bf || exit 1

stage 5/9 "bf fill-ins -> complete the headline-task table"
run_fam phiseg_7_1_bf lidc_bf  max || echo "WARN: phiseg_7_1_bf incomplete"
run_fam detunet_bf   lidc2_bf  max || echo "WARN: detunet_bf incomplete"
plots "$(L lidc_bf phiseg_7_5_bf)" "$(L lidc_bf probunet_bf)" \
      "$(L lidc_bf phiseg_7_1_bf)" "$(L lidc2_bf detunet_bf)" bf_

stage 6/9 "1annot trio"
bash scripts/annot1_run.sh "${STEPS}"
bash scripts/harvest_results.sh

stage 7/9 "ms + nested fill-ins"
run_fam phiseg_7_1_ms lidc_ms  max   || echo "WARN: phiseg_7_1_ms incomplete"
run_fam detunet_ms   lidc2_ms  max   || echo "WARN: detunet_ms incomplete"
run_fam phiseg_7_1_synth lidc_synth synth || echo "WARN: phiseg_7_1_synth incomplete"
run_fam detunet_synth   lidc2_synth synth || echo "WARN: detunet_synth incomplete"
plots "$(L lidc_ms phiseg_7_5_ms)" "$(L lidc_ms probunet_ms)" \
      "$(L lidc_ms phiseg_7_1_ms)" "$(L lidc2_ms detunet_ms)" ms_
plots "$(L lidc_synth phiseg_7_5_synth)" "$(L lidc_synth probunet_synth)" \
      "$(L lidc_synth phiseg_7_1_synth)" "$(L lidc2_synth detunet_synth)" ""
bash scripts/harvest_results.sh

stage 8/9 "phiseg_7_5_ms 48k extension"
extend_48k phiseg_7_5_ms lidc_ms || echo "WARN: ms 48k extension incomplete"

stage 9/9 "perf: conv-layout lever sweep"
if [ -s artifacts/layout_sweep.txt ]; then
  echo "layout sweep already recorded, skipping"
else
  timeout -k 60 7200 python scripts/perf_lab.py layout-sweep || true
  bash scripts/harvest_results.sh
fi

echo "=== round-4c chain complete $(date -u +%H:%M:%S) ==="
