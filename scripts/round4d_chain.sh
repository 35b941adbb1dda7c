#!/usr/bin/env bash
# Round-4 queue, 4th revision (session restart #3, 2026-08-18 ~06:50 UTC).
# The VM wiped again: logs/ (checkpoints, jax cache) are gone; the durable
# state is the git-tracked results/ tree (bf decisive pair + phiseg_7_5_ms
# fully evaled and harvested).  Differences vs round4c_chain.sh:
#   * fam_done() keys on results/ (durable) instead of logs/ (volatile), so
#     already-harvested families are skipped instead of retrained;
#   * reordered for value-per-TPU-hour after the wipe: finish the ms pair,
#     then the bfxl decisive pair, nested pair, layout sweep (VERDICT r3 #5,
#     cheap, never attempted), 1annot trio (round-2 carryover), fill-ins;
#   * the 48k extensions moved last: their 24k checkpoints were wiped, so
#     they now cost a full 48k retrain (2x) -- lowest value per hour;
#   * plots read from results/ so they work for skipped families.
# Launch:  setsid bash scripts/chain_watch.sh scripts/round4d_chain.sh
# Every unit harvests+commits on completion; safe to kill and relaunch.
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

# npz exists AND holds >= NIMG rows
done_npz() {
  [ -f "$1" ] && python - "$1" "${NIMG}" <<'EOF'
import sys
import numpy as np
with np.load(sys.argv[1]) as z:
    arr = z["arr_0"] if "arr_0" in z else z[list(z.keys())[0]]
sys.exit(0 if arr.shape[0] >= int(sys.argv[2]) else 1)
EOF
}

# A family is done when its harvested (git-durable) evals are complete.
fam_done() {  # DIRN EXP
  done_npz "results/$1/$2/ncc50_best_ged.npz" && \
  done_npz "results/$1/$2/dice_best_dice.npz"
}

run_fam() {  # EXP DIRN MODE
  if fam_done "$2" "$1"; then
    echo "--- family $1 already harvested in results/$2/$1; skipping"
    return 0
  fi
  echo "--- family $1 ($(date -u +%H:%M:%S))"
  preflight || return 1
  bash scripts/train_eval_family.sh "$1" "$2" "${STEPS}" "${NIMG}" "$3"
  local RC=$?
  bash scripts/harvest_results.sh
  return "${RC}"
}

R() { echo "${REPO_ROOT}/results/$1/$2"; }

plots() {  # D75 DPU D71 DDET PREFIX   (dirs under results/)
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
  bash scripts/harvest_results.sh
}

extend_48k() {  # EXP DIRN  (post-wipe: full 48k retrain; only if time allows)
  local EXP="$1" DIRN="$2"
  local D="${PHISEG_LOG_ROOT}/${DIRN}/${EXP}"
  if done_npz "results/${DIRN}/${EXP}/ncc50_best_ged_48k.npz"; then
    echo "--- ${EXP} 48k eval already harvested; skipping"
    return 0
  fi
  python -m phiseg_tpu.cli.train "${EXP}" --num-iter 48000 \
    --no-image-summaries --no-histogram-summaries || return 1
  python -m phiseg_tpu.cli.test_quantitative "${D}" \
    --samples 50 --batch 8 --max-images "${NIMG}" --tag best_ged --out-suffix _48k \
    || return 1
  bash scripts/harvest_results.sh
}

stage 1/8 "complete the ms decisive pair (probunet_ms full retrain after wipe)"
run_fam phiseg_7_5_ms lidc_ms max || exit 1
run_fam probunet_ms  lidc_ms max || exit 1
plots "$(R lidc_ms phiseg_7_5_ms)" "$(R lidc_ms probunet_ms)" \
      /nonexistent /nonexistent ms_

stage 2/8 "bfxl decisive pair (8x data, same budget)"
run_fam phiseg_7_5_bfxl lidc_bfxl max || exit 1
run_fam probunet_bfxl  lidc_bfxl max || exit 1
plots "$(R lidc_bfxl phiseg_7_5_bfxl)" "$(R lidc_bfxl probunet_bfxl)" \
      /nonexistent /nonexistent bfxl_

stage 3/8 "nested decisive pair at n=256 (retrain after wipe)"
run_fam phiseg_7_5_synth lidc_synth synth || exit 1
run_fam probunet_synth  lidc_synth synth || exit 1
plots "$(R lidc_synth phiseg_7_5_synth)" "$(R lidc_synth probunet_synth)" \
      /nonexistent /nonexistent ""

stage 4/8 "perf: conv-layout lever sweep (VERDICT r3 #5)"
if [ -s artifacts/layout_sweep.txt ]; then
  echo "layout sweep already recorded, skipping"
else
  timeout -k 60 7200 python scripts/perf_lab.py layout-sweep || true
  bash scripts/harvest_results.sh
fi

stage 5/8 "1annot trio (round-2 carryover)"
if fam_done lidc_synth phiseg_7_5_1annot_synth && \
   fam_done lidc_synth phiseg_7_1_1annot_synth && \
   fam_done lidc_synth probunet_1annot_synth; then
  echo "1annot trio already harvested; skipping"
else
  bash scripts/annot1_run.sh "${STEPS}"
  bash scripts/harvest_results.sh
fi

stage 6/8 "bf + ms + nested fill-ins (7_1 / detunet)"
run_fam phiseg_7_1_bf lidc_bf  max || echo "WARN: phiseg_7_1_bf incomplete"
run_fam detunet_bf   lidc2_bf  max || echo "WARN: detunet_bf incomplete"
plots "$(R lidc_bf phiseg_7_5_bf)" "$(R lidc_bf probunet_bf)" \
      "$(R lidc_bf phiseg_7_1_bf)" "$(R lidc2_bf detunet_bf)" bf_
run_fam phiseg_7_1_ms lidc_ms  max   || echo "WARN: phiseg_7_1_ms incomplete"
run_fam detunet_ms   lidc2_ms  max   || echo "WARN: detunet_ms incomplete"
plots "$(R lidc_ms phiseg_7_5_ms)" "$(R lidc_ms probunet_ms)" \
      "$(R lidc_ms phiseg_7_1_ms)" "$(R lidc2_ms detunet_ms)" ms_
run_fam phiseg_7_1_synth lidc_synth synth || echo "WARN: phiseg_7_1_synth incomplete"
run_fam detunet_synth   lidc2_synth synth || echo "WARN: detunet_synth incomplete"
plots "$(R lidc_synth phiseg_7_5_synth)" "$(R lidc_synth probunet_synth)" \
      "$(R lidc_synth phiseg_7_1_synth)" "$(R lidc2_synth detunet_synth)" ""

stage 7/8 "48k extensions (full retrain post-wipe; lowest priority)"
extend_48k phiseg_7_5_ms lidc_ms || echo "WARN: ms 48k extension incomplete"
extend_48k phiseg_7_5_bf lidc_bf || echo "WARN: bf 48k extension incomplete"
extend_48k probunet_bf  lidc_bf || echo "WARN: probunet bf 48k extension incomplete"

stage 8/8 "final harvest"
bash scripts/harvest_results.sh
echo "=== round-4d chain complete $(date -u +%H:%M:%S) ==="
