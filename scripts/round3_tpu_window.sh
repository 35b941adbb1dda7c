#!/usr/bin/env bash
# Round-3 maintenance window, run while the training chain is paused at a
# family boundary (everything auto-resumes afterwards):
#   1. full CPU test suite (the 1-vCPU rule: never concurrent with TPU jobs)
#   2. fresh xplane capture of the PRODUCTION fused train step (the round-2
#      capture in /tmp/phiseg_profile_train predates aug fusion) + op table
set -uo pipefail
REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "${REPO_ROOT}"

echo "=== [1/3] full test suite $(date -u +%H:%M:%S) ==="
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -x -q 2>&1 | tail -5

echo "=== [2/3] driver contract: dryrun_multichip(8) $(date -u +%H:%M:%S) ==="
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -c "import __graft_entry__ as g; g.dryrun_multichip(8)" 2>&1 | tail -3

echo "=== [3/3] fused-step profile $(date -u +%H:%M:%S) ==="
export PYTHONPATH="${REPO_ROOT}:/root/.axon_site"
python scripts/profile_step.py train /tmp/phiseg_profile_fused 2>&1 | tail -30
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
  python scripts/xplane_report.py /tmp/phiseg_profile_fused 30 \
  > artifacts/fused_step_op_profile.txt 2>/dev/null || true
grep -v "^I0000\|^WARNING" artifacts/fused_step_op_profile.txt | head -40

echo "=== window done $(date -u +%H:%M:%S) ==="
