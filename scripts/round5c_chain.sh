#!/usr/bin/env bash
# Round-5c TPU queue: supersedes round5b_chain.sh, whose extend_48k passed
# --max-images 256 to the nested-task (lidc_synth) evals. That flag only
# CAPS the split; the *_synth configs ship synth_n_test=32, so the nested
# 48k pair landed as n=32 evals. The correct flag for the nested task is
# --synth-n-test 256 (grows the split; the generator's deterministic
# prefix property keeps n=32 a prefix of n=256 -- see
# train_eval_family.sh MODE=synth). bf tasks have synth_n_test=256 in
# config, so --max-images is correct there.
# Remaining work (stages 1-3 of round5b are done and keep their guards):
#   1. nested 48k pair RE-EVAL at n=256 (checkpoints alive in logs/).
#   2. 1annot 48k pair: train (auto-resume) + n=256 eval.
#   3. bf-512 48k pair (stretch).
# All stages self-skip on a committed >=256-row artifact; relaunch is safe.
# Launch:  setsid bash scripts/chain_watch.sh scripts/round5c_chain.sh \
#            >> /tmp/round5.log 2>&1 &
#   (chain_watch.sh self-records its PGID in /tmp/chain_watch.pid for
#    deadline_stop.sh)
set -o pipefail
cd "$(dirname "${BASH_SOURCE[0]}")/.."
REPO_ROOT="$(pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
export PHISEG_LOG_ROOT="${PHISEG_LOG_ROOT:-${REPO_ROOT}/logs}"
mkdir -p artifacts
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

# extend_48k EXP DIRN MODE  -- MODE=synth passes --synth-n-test NIMG
# (nested/1annot task), MODE=max passes --max-images NIMG (bf task).
extend_48k() {
  local EXP="$1" DIRN="$2" MODE="$3"
  local D="${PHISEG_LOG_ROOT}/${DIRN}/${EXP}"
  local EVAL_ARGS
  case "${MODE}" in
    max)   EVAL_ARGS=(--max-images "${NIMG}") ;;
    synth) EVAL_ARGS=(--synth-n-test "${NIMG}") ;;
    *) echo "unknown MODE ${MODE}"; return 2 ;;
  esac
  if done_npz "results/${DIRN}/${EXP}/ncc50_best_ged_48k.npz" \
     && done_npz "results/${DIRN}/${EXP}/ged50_best_ged_48k.npz"; then
    echo "--- ${EXP} 48k eval already harvested at n>=${NIMG}; skipping"
    return 0
  fi
  preflight || return 1
  if [ -f "${D}/model.ckpt-48000.msgpack" ]; then
    echo "--- ${EXP} 48k checkpoint alive; going straight to eval"
  else
    # cli.train auto-resumes from the latest checkpoint in ${D}; across a
    # session wipe this trains from scratch to the same 48k budget.
    python -m phiseg_tpu.cli.train "${EXP}" --num-iter 48000 \
      --no-image-summaries --no-histogram-summaries || return 1
  fi
  python -m phiseg_tpu.cli.test_quantitative "${D}" \
    --samples 50 --batch 8 "${EVAL_ARGS[@]}" --tag best_ged --out-suffix _48k \
    || return 1
  bash scripts/harvest_results.sh
}

stage 1/3 "nested 48k pair re-eval at n=256 (round5b ran them at n=32)"
extend_48k phiseg_7_5_synth lidc_synth synth || echo "WARN: phiseg nested 48k incomplete"
extend_48k probunet_synth  lidc_synth synth || echo "WARN: probunet nested 48k incomplete"

stage 2/3 "1annot 48k pair (is the 1-annot win budget or memorisation?)"
extend_48k phiseg_7_5_1annot_synth lidc_synth synth || echo "WARN: phiseg 1annot 48k incomplete"
extend_48k probunet_1annot_synth  lidc_synth synth || echo "WARN: probunet 1annot 48k incomplete"

stage 3/3 "bf-512 48k pair (stretch: plateau on starved data)"
extend_48k phiseg_7_5_bf lidc_bf max || echo "WARN: phiseg bf 48k incomplete"
extend_48k probunet_bf  lidc_bf max || echo "WARN: probunet bf 48k incomplete"

bash scripts/harvest_results.sh
echo "=== round-5c chain complete $(date -u +%H:%M:%S) ==="
