#!/usr/bin/env bash
# Round-4 queue, 6th revision (2026-08-18 ~08:50 UTC), superseding round4e.
# What changed: the 24k checkpoints for lidc_bfxl/* and lidc_ms/* are ALIVE
# on this session's disk (no wipe since they trained), so the 48k
# extensions are cheap auto-resumes (~25 min/pair), not full retrains --
# and the training curves make them decisive: phiseg_7_5_bfxl's val GED is
# still falling monotonically at the 24k cutoff (best_ged ckpt at step
# 23501!) while probunet_bfxl plateaued in its first third. VERDICT r3
# next-round #2 asks exactly this prove-or-retire.
# Priority after the nested pair: 1annot decisive pair -> bfxl 48k pair ->
# layout sweep (incremental) -> 7_1_1annot -> ms 48k -> fill-ins.
# Launch:  setsid bash scripts/chain_watch.sh scripts/round4f_chain.sh
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

extend_48k() {  # EXP DIRN  (auto-resume from the live 24k checkpoint)
  local EXP="$1" DIRN="$2"
  local D="${PHISEG_LOG_ROOT}/${DIRN}/${EXP}"
  if done_npz "results/${DIRN}/${EXP}/ncc50_best_ged_48k.npz"; then
    echo "--- ${EXP} 48k eval already harvested; skipping"
    return 0
  fi
  preflight || return 1
  python -m phiseg_tpu.cli.train "${EXP}" --num-iter 48000 \
    --no-image-summaries --no-histogram-summaries || return 1
  # --out-suffix keeps the canonical 24k-budget npz intact: matched-budget
  # tables must never silently mix training budgets.
  python -m phiseg_tpu.cli.test_quantitative "${D}" \
    --samples 50 --batch 8 --max-images "${NIMG}" --tag best_ged --out-suffix _48k \
    || return 1
  bash scripts/harvest_results.sh
}

stage 1/9 "decisive pairs (self-skip when harvested)"
run_fam phiseg_7_5_ms lidc_ms max || exit 1
run_fam probunet_ms  lidc_ms max || exit 1
run_fam phiseg_7_5_bfxl lidc_bfxl max || exit 1
run_fam probunet_bfxl  lidc_bfxl max || exit 1
run_fam phiseg_7_5_synth lidc_synth synth || exit 1
run_fam probunet_synth  lidc_synth synth || exit 1
plots "$(R lidc_synth phiseg_7_5_synth)" "$(R lidc_synth probunet_synth)" \
      /nonexistent /nonexistent ""

stage 2/9 "1annot decisive pair (round-2 carryover)"
run_fam phiseg_7_5_1annot_synth lidc_synth synth || echo "WARN: 7_5_1annot incomplete"
run_fam probunet_1annot_synth  lidc_synth synth || echo "WARN: probunet_1annot incomplete"

stage 3/9 "bfxl 48k pair (cheap resume; convergence-asymmetry prove-or-retire)"
extend_48k phiseg_7_5_bfxl lidc_bfxl || echo "WARN: phiseg bfxl 48k incomplete"
extend_48k probunet_bfxl  lidc_bfxl || echo "WARN: probunet bfxl 48k incomplete"

stage 4/9 "perf: conv-layout lever sweep (VERDICT r3 #5; incremental+resumable)"
if [ -s artifacts/layout_sweep.txt ] && grep -q "SWEEP COMPLETE" artifacts/layout_sweep.txt; then
  echo "layout sweep already recorded, skipping"
else
  timeout -k 60 5400 python scripts/perf_lab.py layout-sweep || true
  bash scripts/harvest_results.sh
fi

stage 5/9 "1annot third row + trio plots"
run_fam phiseg_7_1_1annot_synth lidc_synth synth || echo "WARN: 7_1_1annot incomplete"
plots "$(R lidc_synth phiseg_7_5_1annot_synth)" "$(R lidc_synth probunet_1annot_synth)" \
      "$(R lidc_synth phiseg_7_1_1annot_synth)" /nonexistent annot1_

stage 6/9 "ms 48k pair (cheap resume)"
extend_48k phiseg_7_5_ms lidc_ms || echo "WARN: ms 48k extension incomplete"
extend_48k probunet_ms  lidc_ms || echo "WARN: probunet ms 48k incomplete"

stage 7/9 "bf fill-ins (complete the bfield quartet)"
run_fam phiseg_7_1_bf lidc_bf  max   || echo "WARN: phiseg_7_1_bf incomplete"
run_fam detunet_bf   lidc2_bf  max   || echo "WARN: detunet_bf incomplete"
plots "$(R lidc_bf phiseg_7_5_bf)" "$(R lidc_bf probunet_bf)" \
      "$(R lidc_bf phiseg_7_1_bf)" "$(R lidc2_bf detunet_bf)" bf_

stage 8/9 "ms + nested fill-ins"
run_fam phiseg_7_1_ms lidc_ms  max   || echo "WARN: phiseg_7_1_ms incomplete"
run_fam detunet_ms   lidc2_ms  max   || echo "WARN: detunet_ms incomplete"
plots "$(R lidc_ms phiseg_7_5_ms)" "$(R lidc_ms probunet_ms)" \
      "$(R lidc_ms phiseg_7_1_ms)" "$(R lidc2_ms detunet_ms)" ms_
run_fam phiseg_7_1_synth lidc_synth synth || echo "WARN: phiseg_7_1_synth incomplete"
run_fam detunet_synth   lidc2_synth synth || echo "WARN: detunet_synth incomplete"

stage 9/9 "final harvest"
bash scripts/harvest_results.sh
echo "=== round-4f chain complete $(date -u +%H:%M:%S) ==="
