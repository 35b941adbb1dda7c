#!/usr/bin/env bash
# Round-4 TPU work queue, priority-ordered per VERDICT r3 "next round".
# Every cli.train run auto-resumes from its latest checkpoint and exits
# immediately when already at --num-iter; evals skip when their npz exists
# -- so the whole chain is interruptible and cheap to relaunch
# (scripts/tunnel_watch.sh does so automatically after failures).
#
# Each stage gets (a) a cheap tunnel preflight so a dead backend fails the
# chain in minutes, not hours of blocked RPCs, and (b) a generous backstop
# timeout so a dispatch hung on a mid-run tunnel drop cannot wedge the
# watcher loop forever (auto-resume makes a killed trainer lose at most
# the steps since its last validation).
#
# Quick wins run FIRST (a real bench record + the Pallas real-TPU parity
# artifact; round 3 lost both to an outage at round end). bench.py and
# every trainer/eval hold/honour the advisory TPU lock
# (phiseg_tpu/utils/tpu_lock.py).
# Launch:  bash scripts/round4_chain.sh & echo $! > /tmp/round4_chain.pid
set -e
cd "$(dirname "${BASH_SOURCE[0]}")/.."
REPO_ROOT="$(pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
mkdir -p artifacts

preflight() {
  timeout -k 30 420 python -c "import jax; assert jax.devices()[0].platform=='tpu'" \
    || { echo "!!! tunnel preflight failed $(date -u +%H:%M:%S)"; exit 1; }
}

stage() { echo "=== [$1] $2 $(date -u +%H:%M:%S) ==="; preflight; }

stage 1/8 "bench capture (early, real record)"
timeout -k 60 3600 python bench.py | tee artifacts/bench_r4_early.json
if grep -q '"value": 0.0' artifacts/bench_r4_early.json; then
  echo "!!! bench recorded a zero line (backend trouble)"; exit 1
fi

stage 2/8 "Pallas real-TPU parity artifact"
timeout -k 60 2400 python scripts/pallas_tpu_parity.py

# NOTE: the bash-wrapper stages below carry no backstop timeout on purpose:
# `timeout` kills only the wrapper, orphaning a lock-holding python child.
# Instead every lock acquire is bounded (tpu_lock max_wait) and the
# trainers/evals themselves die on tunnel errors, failing the chain fast.

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
# preserve the 24k-budget eval row before the 48k re-eval overwrites it
if [ -f "${MS75}/ged50_best_ged.npz" ] && [ ! -f "${MS75}/ged50_best_ged_24k.npz" ]; then
  cp "${MS75}/ged50_best_ged.npz" "${MS75}/ged50_best_ged_24k.npz"
  cp "${MS75}/ncc50_best_ged.npz" "${MS75}/ncc50_best_ged_24k.npz"
fi
python -m phiseg_tpu.cli.train phiseg_7_5_ms --num-iter 48000 \
  --no-image-summaries --no-histogram-summaries
if [ ! -f "${MS75}/ged50_best_ged_48k.npz" ]; then
  python -m phiseg_tpu.cli.test_quantitative "${MS75}" \
    --samples 50 --batch 8 --max-images 256 --tag best_ged
  cp "${MS75}/ged50_best_ged.npz" "${MS75}/ged50_best_ged_48k.npz"
fi

stage 8/8 "perf: conv-layout lever sweep"
timeout -k 60 7200 python scripts/perf_lab.py layout-sweep || true

echo "=== round-4 chain complete $(date -u +%H:%M:%S) ==="
