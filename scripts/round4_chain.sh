#!/usr/bin/env bash
# Round-4 TPU work queue, priority-ordered. Every cli.train run auto-resumes
# from its latest checkpoint and exits immediately when already at
# --num-iter, so the whole chain is interruptible: kill the chain PID and
# the current trainer PID (exact PIDs only, never by pattern), do
# maintenance, relaunch — completed stages re-run only their cheap evals.
# Launch:  bash scripts/round4_chain.sh & echo $! > /tmp/round4_chain.pid
# STOP ALL TPU WORK ~20 min before round end or the driver's bench.py
# contends with the trainer and records garbage.
cd "$(dirname "${BASH_SOURCE[0]}")/.."

echo "=== [1/4] bfield 4-family comparison $(date -u +%H:%M:%S) ==="
bash scripts/bf_comparison_run.sh 24000
echo "=== [2/4] multiscale test-protocol evals $(date -u +%H:%M:%S) ==="
bash scripts/ms_eval_only.sh 256
echo "=== [3/4] 1annot trio $(date -u +%H:%M:%S) ==="
bash scripts/annot1_run.sh 24000
echo "=== [4/4] nested-task n256 re-eval $(date -u +%H:%M:%S) ==="
bash scripts/reeval_n256.sh
echo "=== round-4 chain complete $(date -u +%H:%M:%S) ==="
