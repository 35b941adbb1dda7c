#!/usr/bin/env bash
# SUPERSEDED by round5c_chain.sh: extend_48k below passes --max-images to
# the nested-task (lidc_synth) evals, which only caps the config's
# synth_n_test=32 split -- the nested 48k pair landed as n=32 evals. The
# nested task needs --synth-n-test 256 (see train_eval_family.sh
# MODE=synth). Kept for provenance of stages 1-3, which were correct.
# Round-5b TPU queue (final round, second half) -- written after the
# round-5 session restart. The evidence tree is complete (all quartets
# harvested); what remains is closure:
#   1. pytest_r5 artifact (self-skips; normally produced before launch).
#   2. bench_r5_early.json -- a fresh-process driver-style perf record at
#      final-ish HEAD (VERDICT r4 item 4).
#   3. Pallas parity regeneration with the masked-rel column + gate
#      footnote (VERDICT r4 weak #6).
#   4. nested 48k pair -- the budget-confounder test on the ~1-dim task:
#      every 24k scoreboard row ProbUNet wins is potentially
#      budget-confounded (bfxl and ms both flipped/tied at plateau); this
#      closes the last untested task. Either outcome sharpens the
#      synthesis (a surviving ProbUNet win would pin the win to
#      conditional dimensionality rather than budget).
#   5. 1annot 48k pair -- tests the third clause of the synthesis (the
#      single-annotator win): the diversity-collapse analysis says this is
#      memorisation, not budget, so the prediction is ProbUNet KEEPS
#      winning at plateau. A falsifiable prediction made before the run.
#   6. bf-512 48k pair (stretch) -- plateau on starved data.
# All stages self-skip on their committed artifact, so relaunch is safe.
# Launch:  setsid bash scripts/chain_watch.sh scripts/round5b_chain.sh \
#            >> /tmp/round5.log 2>&1 &   echo $! > /tmp/chain_watch.pid
#          setsid bash scripts/deadline_stop.sh <stop_epoch> \
#            >> /tmp/round5.log 2>&1 &   echo $! > /tmp/deadline.pid
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

commit_artifacts() {
  git add artifacts/ && git commit -q -m "$1

No-Verification-Needed: artifact-only harvest from the TPU chain" \
    || echo "--- nothing to commit for: $1"
}

extend_48k() {  # EXP DIRN  (identical contract to round5_chain.sh)
  local EXP="$1" DIRN="$2"
  local D="${PHISEG_LOG_ROOT}/${DIRN}/${EXP}"
  if done_npz "results/${DIRN}/${EXP}/ncc50_best_ged_48k.npz" \
     && done_npz "results/${DIRN}/${EXP}/ged50_best_ged_48k.npz"; then
    echo "--- ${EXP} 48k eval already harvested; skipping"
    return 0
  fi
  preflight || return 1
  if [ -f "${D}/model.ckpt-48000.msgpack" ]; then
    echo "--- ${EXP} 48k checkpoint alive; going straight to eval"
  else
    # logs/ was wiped with the session, so this trains from scratch to the
    # 48k budget -- a valid matched-48k run (same as phiseg_7_5_ms's).
    python -m phiseg_tpu.cli.train "${EXP}" --num-iter 48000 \
      --no-image-summaries --no-histogram-summaries || return 1
  fi
  python -m phiseg_tpu.cli.test_quantitative "${D}" \
    --samples 50 --batch 8 --max-images "${NIMG}" --tag best_ged --out-suffix _48k \
    || return 1
  bash scripts/harvest_results.sh
}

stage 1/6 "pytest_r5 artifact (self-skips when already recorded)"
if [ ! -f artifacts/pytest_r5.txt ]; then
  { echo "commit: $(git rev-parse --short HEAD)  $(date -u --iso-8601=seconds)";
    python -c "import sys, jax, flax; print('python', sys.version.split()[0], 'jax', jax.__version__, 'flax', flax.__version__)" 2>/dev/null;
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q 2>&1 | tail -15;
  } > artifacts/pytest_r5.txt
  commit_artifacts "Record round-5 full test-suite run (artifacts/pytest_r5.txt)"
else
  echo "--- pytest_r5.txt already recorded; skipping"
fi

stage 2/6 "bench_r5_early (fresh-process driver-style perf record)"
if [ ! -f artifacts/bench_r5_early.json ]; then
  timeout -k 60 3600 python bench.py > /tmp/bench_r5.tmp
  if python -c "import json,sys; r=json.load(open('/tmp/bench_r5.tmp')); sys.exit(0 if r.get('value',0)>0 else 1)"; then
    mv /tmp/bench_r5.tmp artifacts/bench_r5_early.json
    commit_artifacts "Record early round-5 bench (fresh process, final-round HEAD)"
  else
    echo "WARN: bench_r5_early produced no valid record"
  fi
else
  echo "--- bench_r5_early.json already recorded; skipping"
fi

stage 3/6 "Pallas parity regen with masked-rel column + gate footnote"
if ! grep -q "rel|ref|>1e-4" artifacts/pallas_tpu_parity.txt 2>/dev/null; then
  timeout -k 60 2400 python scripts/pallas_tpu_parity.py \
    && commit_artifacts "Regenerate Pallas TPU parity artifact with masked-rel column and abs/rel gate footnote" \
    || echo "WARN: pallas parity regen failed"
else
  echo "--- parity artifact already has the masked-rel column; skipping"
fi

stage 4/6 "nested 48k pair (budget confounder at ~1 conditional dim)"
extend_48k phiseg_7_5_synth lidc_synth || echo "WARN: phiseg nested 48k incomplete"
extend_48k probunet_synth  lidc_synth || echo "WARN: probunet nested 48k incomplete"

stage 5/6 "1annot 48k pair (is the 1-annot win budget or memorisation?)"
extend_48k phiseg_7_5_1annot_synth lidc_synth || echo "WARN: phiseg 1annot 48k incomplete"
extend_48k probunet_1annot_synth  lidc_synth || echo "WARN: probunet 1annot 48k incomplete"

stage 6/6 "bf-512 48k pair (stretch: plateau on starved data)"
extend_48k phiseg_7_5_bf lidc_bf || echo "WARN: phiseg bf 48k incomplete"
extend_48k probunet_bf  lidc_bf || echo "WARN: probunet bf 48k incomplete"

bash scripts/harvest_results.sh
echo "=== round-5b chain complete $(date -u +%H:%M:%S) ==="
