#!/usr/bin/env bash
# Round-4 TPU work queue, priority-ordered per VERDICT r3 "next round",
# REBUILT for the mid-round VM wipe: the session restart destroyed logs/
# (all round-2/3 checkpoints and eval npz files), so every quartet must
# retrain from scratch and every landed result must be committed to git
# immediately (scripts/harvest_results.sh) -- disk does not survive.
#
# Ordering under that reality: quick wins first (bench record, Pallas
# real-TPU parity), then the DECISIVE PAIRS (phiseg_7_5 vs probunet) of the
# three synthetic tasks -- bfield first, the purpose-built regime for the
# reference's headline claim (README.md:53-54) -- then the 7_1/detunet
# fill-in rows, then the 1annot trio, the 48k convergence extension, and
# the conv-layout perf sweep. Every family is train->eval interleaved
# (scripts/train_eval_family.sh, idempotent) so an interruption at any
# point leaves completed families fully evaluated and committed.
#
# Each stage gets a cheap tunnel preflight so a dead backend fails the
# chain in minutes; scripts/tunnel_watch.sh relaunches after failures and
# every completed unit skips itself on relaunch.
# Launch:  bash scripts/round4_chain.sh & echo $! > /tmp/round4_chain.pid
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

# run_fam EXP DIRN MODE -> train+eval one family, then commit its artifacts
run_fam() {
  echo "--- family $1 ($(date -u +%H:%M:%S))"
  preflight || return 1
  bash scripts/train_eval_family.sh "$1" "$2" "${STEPS}" "${NIMG}" "$3"
  local RC=$?
  bash scripts/harvest_results.sh
  return "${RC}"
}

L() { echo "${PHISEG_LOG_ROOT}/$1/$2"; }

# plots TASKTAG DIR75 DIRPU DIR71 DIRDET PNGPREFIX -- aggregate whichever
# families completed (>=2 required); best-effort, never fails the chain.
plots() {
  local D75="$1" DPU="$2" D71="$3" DDET="$4" PREFIX="$5"
  local STEMQ; local M
  for M in ged ncc dice; do
    local STEM="dice_best_dice"; [ "${M}" != "dice" ] && STEM="${M}50_best_ged"
    local FILES=() NAMES=()
    for ROW in "phiseg_7_5:${D75}" "probunet:${DPU}" \
               "phiseg_7_1:${D71}" "detunet:${DDET}"; do
      local NAME="${ROW%%:*}" DIR="${ROW#*:}"
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

BENCH=artifacts/bench_r4_early.json
if [ -s "${BENCH}" ] && ! grep -q '"value": 0.0' "${BENCH}"; then
  echo "=== [1/8] bench capture: already recorded, skipping ==="
else
  stage 1/8 "bench capture (early, real record)"
  timeout -k 60 3600 python bench.py | tee "${BENCH}.tmp"
  if ! grep -q '"images/sec"' "${BENCH}.tmp" || grep -q '"value": 0.0' "${BENCH}.tmp"; then
    echo "!!! bench produced no valid record"; exit 1
  fi
  mv "${BENCH}.tmp" "${BENCH}"
  bash scripts/harvest_results.sh
fi

PARITY=artifacts/pallas_tpu_parity.txt
if [ -s "${PARITY}" ] && grep -q "ALL OK" "${PARITY}"; then
  echo "=== [2/8] Pallas parity: already recorded, skipping ==="
else
  stage 2/8 "Pallas real-TPU parity artifact"
  timeout -k 60 2400 python scripts/pallas_tpu_parity.py
  bash scripts/harvest_results.sh
fi

stage 3/8 "bfield decisive pair (headline claim)"
run_fam phiseg_7_5_bf lidc_bf max || exit 1
run_fam probunet_bf  lidc_bf max || exit 1
plots "$(L lidc_bf phiseg_7_5_bf)" "$(L lidc_bf probunet_bf)" \
      "$(L lidc_bf phiseg_7_1_bf)" "$(L lidc2_bf detunet_bf)" bf_

stage 4/8 "ms + nested decisive pairs"
run_fam phiseg_7_5_ms lidc_ms max || exit 1
run_fam probunet_ms  lidc_ms max || exit 1
run_fam phiseg_7_5_synth lidc_synth synth || exit 1
run_fam probunet_synth  lidc_synth synth || exit 1

stage 5/8 "7_1 + detunet fill-in rows (all three tasks)"
run_fam phiseg_7_1_bf lidc_bf  max   || echo "WARN: phiseg_7_1_bf incomplete"
run_fam detunet_bf   lidc2_bf  max   || echo "WARN: detunet_bf incomplete"
run_fam phiseg_7_1_ms lidc_ms  max   || echo "WARN: phiseg_7_1_ms incomplete"
run_fam detunet_ms   lidc2_ms  max   || echo "WARN: detunet_ms incomplete"
run_fam phiseg_7_1_synth lidc_synth synth || echo "WARN: phiseg_7_1_synth incomplete"
run_fam detunet_synth   lidc2_synth synth || echo "WARN: detunet_synth incomplete"
plots "$(L lidc_bf phiseg_7_5_bf)" "$(L lidc_bf probunet_bf)" \
      "$(L lidc_bf phiseg_7_1_bf)" "$(L lidc2_bf detunet_bf)" bf_
plots "$(L lidc_ms phiseg_7_5_ms)" "$(L lidc_ms probunet_ms)" \
      "$(L lidc_ms phiseg_7_1_ms)" "$(L lidc2_ms detunet_ms)" ms_
plots "$(L lidc_synth phiseg_7_5_synth)" "$(L lidc_synth probunet_synth)" \
      "$(L lidc_synth phiseg_7_1_synth)" "$(L lidc2_synth detunet_synth)" ""
bash scripts/harvest_results.sh

stage 6/8 "1annot trio"
bash scripts/annot1_run.sh "${STEPS}"
bash scripts/harvest_results.sh

stage 7/8 "phiseg_7_5_ms ${STEPS} -> 48k extension (convergence-asymmetry test)"
MS75="$(L lidc_ms phiseg_7_5_ms)"
python -m phiseg_tpu.cli.train phiseg_7_5_ms --num-iter 48000 \
  --no-image-summaries --no-histogram-summaries
# --out-suffix keeps the canonical 24k-budget npz intact: the matched-budget
# ms table must never silently mix training budgets.
if [ ! -f "${MS75}/ncc50_best_ged_48k.npz" ]; then
  python -m phiseg_tpu.cli.test_quantitative "${MS75}" \
    --samples 50 --batch 8 --max-images "${NIMG}" --tag best_ged --out-suffix _48k
fi
bash scripts/harvest_results.sh

stage 8/8 "perf: conv-layout lever sweep"
if [ -s artifacts/layout_sweep.txt ]; then
  echo "layout sweep already recorded, skipping"
else
  timeout -k 60 7200 python scripts/perf_lab.py layout-sweep || true
  bash scripts/harvest_results.sh
fi

echo "=== round-4 chain complete $(date -u +%H:%M:%S) ==="
