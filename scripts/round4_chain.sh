#!/usr/bin/env bash
# Round-4 TPU work queue, priority-ordered. Every cli.train auto-resumes
# from its latest checkpoint and exits immediately once at --num-iter, so
# the whole chain is interruptible/resumable (see CLAUDE.md). Launch:
#   bash scripts/round4_chain.sh > /tmp/round4_chain.log 2>&1 &
#   echo $! > /tmp/round4_chain.pid
# STOP IT (kill chain pid + `pgrep -P` child pid, exact pids only) before
# the round's turns run out -- the driver benches the TPU right after.
set -uo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"

echo "=== [1/3] boundary-field comparison $(date -u +%H:%M:%S) ==="
bash "${REPO_ROOT}/scripts/bf_comparison_run.sh" 24000
echo "=== [2/3] 1annot trio $(date -u +%H:%M:%S) ==="
bash "${REPO_ROOT}/scripts/annot1_run.sh" 24000
echo "=== [3/3] leftover n256 re-eval $(date -u +%H:%M:%S) ==="
bash "${REPO_ROOT}/scripts/reeval_n256.sh"
echo "=== chain complete $(date -u +%H:%M:%S) ==="
