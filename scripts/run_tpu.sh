#!/usr/bin/env bash
# Cluster launch glue (the TPU-era equivalent of SGE_scripts/run_on_host.sh:
# that script set up CUDA/virtualenv and ran `python $1 $2` on one SGE GPU).
#
# Usage on a TPU VM / pod slice:
#   scripts/run_tpu.sh phiseg_7_5 [extra cli args...]
# Multi-host (run on every worker; coordinator resolved from TPU metadata):
#   scripts/run_tpu.sh phiseg_7_5 --distributed
set -euo pipefail

REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
export PYTHONPATH="${REPO_ROOT}:${PYTHONPATH:-}"
export PHISEG_LOG_ROOT="${PHISEG_LOG_ROOT:-${REPO_ROOT}/logs}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-${REPO_ROOT}/.jax_cache}"

exec python -m phiseg_tpu.cli.train "$@"
