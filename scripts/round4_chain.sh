#!/usr/bin/env bash
# Round-4 TPU work queue, priority-ordered per VERDICT r3 "next round".
# Every cli.train run auto-resumes from its latest checkpoint and exits
# immediately when already at --num-iter; evals skip when their npz exists
# -- so the whole chain is interruptible: kill the chain PID and the
# current python PID (exact PIDs only, never by pattern), do maintenance,
# relaunch; completed stages re-run in seconds.
#
# Quick wins run FIRST (a real bench record + the Pallas real-TPU parity
# artifact cost ~20 min and round 3 lost both to a tunnel outage at round
# end); the long training stages follow. bench.py and every trainer/eval
# now hold/honour the advisory TPU lock (phiseg_tpu/utils/tpu_lock.py), so
# an end-of-round bench overlap is reported instead of silent.
# Launch:  bash scripts/round4_chain.sh & echo $! > /tmp/round4_chain.pid
cd "$(dirname "${BASH_SOURCE[0]}")/.."
REPO_ROOT="$(pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
mkdir -p artifacts

stage() { echo "=== [$1] $2 $(date -u +%H:%M:%S) ==="; }

stage 1/8 "bench capture (early, real record)"
python bench.py | tee artifacts/bench_r4_early.json

stage 2/8 "Pallas real-TPU parity artifact"
python scripts/pallas_tpu_parity.py

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
[ -f "${MS75}/ged50_best_ged.npz" ] && [ ! -f "${MS75}/ged50_best_ged_24k.npz" ] && \
  cp "${MS75}/ged50_best_ged.npz" "${MS75}/ged50_best_ged_24k.npz" && \
  cp "${MS75}/ncc50_best_ged.npz" "${MS75}/ncc50_best_ged_24k.npz"
python -m phiseg_tpu.cli.train phiseg_7_5_ms --num-iter 48000 \
  --no-image-summaries --no-histogram-summaries
python -m phiseg_tpu.cli.test_quantitative "${MS75}" \
  --samples 50 --batch 8 --max-images 256 --tag best_ged

stage 8/8 "perf: conv-layout lever sweep"
python scripts/perf_lab.py layout-sweep || true

echo "=== round-4 chain complete $(date -u +%H:%M:%S) ==="
