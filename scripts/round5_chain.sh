#!/usr/bin/env bash
# Round-5 TPU queue (final round), written at the end of round 4.
# Priorities, in order:
#   1. Whatever remains of the 1annot trio (third row may have been cut
#      by round 4's deadline stop mid-eval).
#   2. The ms 48k pair -- the one open scientific question left: the 48k
#      extension flipped GED^2 to PHiSeg on bfxl (RESULTS.md); does the
#      same budget confounder explain the ms-regime loss?
#      phiseg_7_5_ms's val GED was still falling monotonically at its
#      24k cutoff while probunet_ms plateaued, same signature as bfxl.
#   3. Family fill-ins so every registered task has the full quartet
#      (bf: 7_1+detunet; ms: 7_1+detunet; nested: 7_1+detunet), with
#      cross-family plots regenerated.
# All stages self-skip when their npz is already harvested into the
# committed results/ tree, so the chain is safe to relaunch at any time.
# NOTE the round-4 lesson (CLAUDE.md): logs/ checkpoints do NOT survive
# session restarts. extend_48k auto-resumes when a 24k checkpoint is
# alive, and silently trains from scratch to 48k when it is not -- both
# are valid matched-48k-budget runs.
# Launch:  setsid bash scripts/chain_watch.sh scripts/round5_chain.sh \
#            >> /tmp/round5.log 2>&1 &
#          echo $! > /tmp/chain_watch.pid
# And arm the deadline (stop_epoch ~30 min before round end):
#          setsid bash scripts/deadline_stop.sh <stop_epoch> \
#            >> /tmp/round5.log 2>&1 &  echo $! > /tmp/deadline.pid
set -o pipefail
cd "$(dirname "${BASH_SOURCE[0]}")/.."
REPO_ROOT="$(pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
export PHISEG_LOG_ROOT="${PHISEG_LOG_ROOT:-${REPO_ROOT}/logs}"
mkdir -p artifacts
STEPS="${ROUND5_STEPS:-24000}"
NIMG=256

preflight() {
  timeout -k 30 420 python -c "import jax; assert jax.devices()[0].platform=='tpu'" \
    || { echo "!!! tunnel preflight failed $(date -u +%H:%M:%S)"; exit 1; }
}
stage() { echo "=== [$1] $2 $(date -u +%H:%M:%S) ==="; preflight; }

done_npz() {
  [ -f "$1" ] && python - "$1" "${NIMG}" <<'EOF'
import sys
import numpy as np
with np.load(sys.argv[1]) as z:
    arr = z["arr_0"] if "arr_0" in z else z[list(z.keys())[0]]
sys.exit(0 if arr.shape[0] >= int(sys.argv[2]) else 1)
EOF
}

fam_done() {  # DIRN EXP
  done_npz "results/$1/$2/ncc50_best_ged.npz" && \
  done_npz "results/$1/$2/dice_best_dice.npz"
}

dice_only_done() {  # DIRN EXP  (detunet has no meaningful NCC)
  done_npz "results/$1/$2/ged50_best_ged.npz" && \
  done_npz "results/$1/$2/dice_best_dice.npz"
}

run_fam() {  # EXP DIRN MODE
  if fam_done "$2" "$1" || { [ "${1#detunet}" != "$1" ] && dice_only_done "$2" "$1"; }; then
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

extend_48k() {  # EXP DIRN  (auto-resume when the 24k ckpt is alive,
                #  from-scratch 48k otherwise -- both matched-budget)
  local EXP="$1" DIRN="$2"
  local D="${PHISEG_LOG_ROOT}/${DIRN}/${EXP}"
  if done_npz "results/${DIRN}/${EXP}/ncc50_best_ged_48k.npz" \
     && done_npz "results/${DIRN}/${EXP}/ged50_best_ged_48k.npz"; then
    echo "--- ${EXP} 48k eval already harvested; skipping"
    return 0
  fi
  preflight || return 1
  # Skip the (multi-hour) training call when a completed 48k checkpoint is
  # already alive -- a kill between training and eval should resume into
  # eval only, not retrain (ADVICE r4).
  if [ -f "${D}/model.ckpt-48000.msgpack" ]; then
    echo "--- ${EXP} 48k checkpoint alive; going straight to eval"
  else
    python -m phiseg_tpu.cli.train "${EXP}" --num-iter 48000 \
      --no-image-summaries --no-histogram-summaries || return 1
  fi
  # --out-suffix keeps the canonical 24k-budget npz intact: matched-budget
  # tables must never silently mix training budgets.
  python -m phiseg_tpu.cli.test_quantitative "${D}" \
    --samples 50 --batch 8 --max-images "${NIMG}" --tag best_ged --out-suffix _48k \
    || return 1
  bash scripts/harvest_results.sh
}

stage 1/6 "finish the 1annot trio (self-skips if round 4 completed it)"
run_fam phiseg_7_1_1annot_synth lidc_synth synth || echo "WARN: 7_1_1annot incomplete"
plots "$(R lidc_synth phiseg_7_5_1annot_synth)" "$(R lidc_synth probunet_1annot_synth)" \
      "$(R lidc_synth phiseg_7_1_1annot_synth)" /nonexistent annot1_

stage 2/6 "ms 48k pair (does the bfxl budget-confounder flip generalise?)"
extend_48k phiseg_7_5_ms lidc_ms || echo "WARN: phiseg ms 48k incomplete"
extend_48k probunet_ms  lidc_ms || echo "WARN: probunet ms 48k incomplete"

stage 3/6 "bf quartet fill-ins"
run_fam phiseg_7_1_bf lidc_bf  max   || echo "WARN: phiseg_7_1_bf incomplete"
run_fam detunet_bf   lidc2_bf  max   || echo "WARN: detunet_bf incomplete"
plots "$(R lidc_bf phiseg_7_5_bf)" "$(R lidc_bf probunet_bf)" \
      "$(R lidc_bf phiseg_7_1_bf)" "$(R lidc2_bf detunet_bf)" bf_

stage 4/6 "ms quartet fill-ins"
run_fam phiseg_7_1_ms lidc_ms  max   || echo "WARN: phiseg_7_1_ms incomplete"
run_fam detunet_ms   lidc2_ms  max   || echo "WARN: detunet_ms incomplete"
plots "$(R lidc_ms phiseg_7_5_ms)" "$(R lidc_ms probunet_ms)" \
      "$(R lidc_ms phiseg_7_1_ms)" "$(R lidc2_ms detunet_ms)" ms_

stage 5/6 "nested quartet fill-ins"
run_fam phiseg_7_1_synth lidc_synth synth || echo "WARN: phiseg_7_1_synth incomplete"
run_fam detunet_synth   lidc2_synth synth || echo "WARN: detunet_synth incomplete"
plots "$(R lidc_synth phiseg_7_5_synth)" "$(R lidc_synth probunet_synth)" \
      "$(R lidc_synth phiseg_7_1_synth)" "$(R lidc2_synth detunet_synth)" nested_

stage 6/6 "final harvest"
bash scripts/harvest_results.sh
echo "=== round-5 chain complete $(date -u +%H:%M:%S) ==="
