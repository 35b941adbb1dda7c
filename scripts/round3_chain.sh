#!/usr/bin/env bash
# Round-3 TPU schedule, priority-ordered (see VERDICT.md "Next round"):
#   1. norm sweep (VERDICT #2: MFU levers -- GN / bf16-BN vs BN)
#   2. multi-scale-ambiguity 4-family comparison @24k (VERDICT #1)
#   3. n>=256 re-eval of the round-2 nested checkpoints (VERDICT #6)
#   4. single-annotator trio @24k (VERDICT #5)
# Every training run auto-resumes from its latest checkpoint, so an
# interrupted chain picks up where it left off on relaunch.
set -uo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="${REPO_ROOT}:/root/.axon_site"
cd "${REPO_ROOT}"

echo "=== [1/4] norm sweep $(date -u +%H:%M:%S) ==="
timeout 3600 python scripts/perf_lab.py norm-sweep 2>&1 | tail -12

echo "=== [2/4] multiscale comparison $(date -u +%H:%M:%S) ==="
bash scripts/ms_comparison_run.sh 24000

echo "=== [3/4] n256 re-eval $(date -u +%H:%M:%S) ==="
bash scripts/reeval_n256.sh

echo "=== [4/4] 1annot trio $(date -u +%H:%M:%S) ==="
bash scripts/annot1_run.sh 24000

echo "=== chain complete $(date -u +%H:%M:%S) ==="
