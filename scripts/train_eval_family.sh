#!/usr/bin/env bash
# Train one experiment to STEPS then run the reference-protocol evals on it
# (GED/NCC @ 50 prior samples from the best_ged checkpoint, Dice of the
# mean softmax over 100 samples from best_dice; reference
# phiseg_test_quantitative.py:24 and phiseg_test_predictions.py:40).
# Idempotent: cli.train auto-resumes and exits immediately at --num-iter;
# eval guards key on the LAST-written artifact of each eval program (ncc
# for the quantitative pair, dice for predictions) so a kill between npz
# writes re-runs only the incomplete eval. Used by round4_chain.sh to
# rebuild every quartet interleaved train->eval, decisive pair first, so an
# interruption leaves completed families fully evaluated.
#
#   train_eval_family.sh EXP DIRN STEPS NIMG MODE
#     MODE=max    pass --max-images NIMG   (ms/bf tasks: synth_n_test=256)
#     MODE=synth  pass --synth-n-test NIMG (nested task: grow the test split;
#                 deterministic prefix property keeps n=32 a prefix of 256)
set -uo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
export PHISEG_LOG_ROOT="${PHISEG_LOG_ROOT:-${REPO_ROOT}/logs}"

EXP="$1"; DIRN="$2"; STEPS="$3"; NIMG="$4"; MODE="$5"
D="${PHISEG_LOG_ROOT}/${DIRN}/${EXP}"
case "${MODE}" in
  max)   EVAL_ARGS=(--max-images "${NIMG}") ;;
  synth) EVAL_ARGS=(--synth-n-test "${NIMG}") ;;
  *) echo "unknown MODE ${MODE}"; exit 2 ;;
esac

# npz must exist AND hold >= NIMG rows (protects against stale small-n files)
done_npz() {
  [ -f "$1" ] && python - "$1" "${NIMG}" <<'EOF'
import sys
import numpy as np
with np.load(sys.argv[1]) as z:
    arr = z["arr_0"] if "arr_0" in z else z[list(z.keys())[0]]
sys.exit(0 if arr.shape[0] >= int(sys.argv[2]) else 1)
EOF
}

python -m phiseg_tpu.cli.train "${EXP}" --num-iter "${STEPS}" \
  --no-image-summaries --no-histogram-summaries || exit 1
done_npz "${D}/ncc50_best_ged.npz" || \
  python -m phiseg_tpu.cli.test_quantitative "${D}" --samples 50 --batch 8 "${EVAL_ARGS[@]}" || exit 1
done_npz "${D}/dice_best_dice.npz" || \
  python -m phiseg_tpu.cli.test_predictions "${D}" --samples 100 --batch 8 "${EVAL_ARGS[@]}" || exit 1
echo "family ${EXP} complete"
