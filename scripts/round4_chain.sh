#!/usr/bin/env bash
# Round-4 TPU work queue, priority-ordered per VERDICT r3 "next round".
# Every cli.train run auto-resumes from its latest checkpoint and exits
# immediately when already at --num-iter; every eval/bench stage skips
# when its artifact already exists -- so the whole chain is interruptible
# and cheap to relaunch (scripts/tunnel_watch.sh does so automatically
# after failures).
#
# Each stage gets a cheap tunnel preflight so a dead backend fails the
# chain in minutes, not hours of blocked RPCs. Direct-python stages also
# get a backstop timeout; the bash-wrapper stages carry none on purpose
# (`timeout` kills only the wrapper, orphaning a lock-holding python
# child) -- their inner trainers/evals die on tunnel errors on their own.
#
# Quick wins run FIRST (a real bench record + the Pallas real-TPU parity
# artifact; round 3 lost both to an outage at round end). bench.py and
# every trainer/eval hold/honour the advisory TPU lock
# (phiseg_tpu/utils/tpu_lock.py).
# Launch:  bash scripts/round4_chain.sh & echo $! > /tmp/round4_chain.pid
set -eo pipefail
cd "$(dirname "${BASH_SOURCE[0]}")/.."
REPO_ROOT="$(pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
mkdir -p artifacts

preflight() {
  timeout -k 30 420 python -c "import jax; assert jax.devices()[0].platform=='tpu'" \
    || { echo "!!! tunnel preflight failed $(date -u +%H:%M:%S)"; exit 1; }
}

stage() { echo "=== [$1] $2 $(date -u +%H:%M:%S) ==="; preflight; }

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
fi

PARITY=artifacts/pallas_tpu_parity.txt
if [ -s "${PARITY}" ] && grep -q "ALL OK" "${PARITY}"; then
  echo "=== [2/8] Pallas parity: already recorded, skipping ==="
else
  stage 2/8 "Pallas real-TPU parity artifact"
  timeout -k 60 2400 python scripts/pallas_tpu_parity.py
fi

stage 3/8 "bfield 4-family comparison (train+eval per family)"
bash scripts/bf_comparison_run.sh 24000 256

stage 4/8 "multiscale test-protocol evals (n=256)"
bash scripts/ms_eval_only.sh 256

stage 5/8 "nested-task n256 re-eval"
bash scripts/reeval_n256.sh

stage 6/8 "1annot trio"
bash scripts/annot1_run.sh 24000

stage 7/8 "phiseg_7_5_ms 24k -> 48k extension (convergence-asymmetry test)"
MS75="${PHISEG_LOG_ROOT:-${REPO_ROOT}/logs}/lidc_ms/phiseg_7_5_ms"
python -m phiseg_tpu.cli.train phiseg_7_5_ms --num-iter 48000 \
  --no-image-summaries --no-histogram-summaries
# --out-suffix keeps the canonical 24k-budget npz from stage 4 intact: the
# matched-budget ms table must never silently mix training budgets.
if [ ! -f "${MS75}/ncc50_best_ged_48k.npz" ]; then
  python -m phiseg_tpu.cli.test_quantitative "${MS75}" \
    --samples 50 --batch 8 --max-images 256 --tag best_ged --out-suffix _48k
fi

stage 8/8 "perf: conv-layout lever sweep"
if [ -s artifacts/layout_sweep.txt ]; then
  echo "layout sweep already recorded, skipping"
else
  timeout -k 60 7200 python scripts/perf_lab.py layout-sweep || true
fi

echo "=== round-4 chain complete $(date -u +%H:%M:%S) ==="
