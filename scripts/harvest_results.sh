#!/usr/bin/env bash
# Copy every durable eval artifact out of the (volatile, gitignored) logs/
# tree into the git-tracked results/ tree and commit. Round 4 learned the
# hard way that the VM disk does not survive session restarts -- the round-2
# and round-3 checkpoints and eval npz files were all wiped with logs/.
# Only git survives, so every landed result is committed the moment the
# producing stage finishes (scripts/round4_chain.sh calls this between
# stages; it is also safe to run by hand at any time).
#
# What is kept per experiment dir:
#   *.npz            -- GED/NCC/Dice eval arrays incl. term decompositions
#   best_metrics.json-- validation-best scalars (selection evidence)
#   config.json      -- the training config snapshot (reproducibility)
#   metrics.jsonl    -- training curve (loss/GED/throughput per validation)
# Checkpoints are NOT harvested (tens of MB each; the npz + config are the
# auditable results). Comparison pngs land in artifacts/ (already tracked).
set -uo pipefail
cd "$(dirname "${BASH_SOURCE[0]}")/.."
LOG_ROOT="${PHISEG_LOG_ROOT:-$(pwd)/logs}"

shopt -s nullglob
CHANGED=0
for EXPDIR in "${LOG_ROOT}"/*/*/; do
  REL="${EXPDIR#"${LOG_ROOT}"/}"          # e.g. lidc_bf/phiseg_7_5_bf/
  DEST="results/${REL}"
  for F in "${EXPDIR}"*.npz "${EXPDIR}"best_metrics*.json \
           "${EXPDIR}"config.json "${EXPDIR}"metrics.jsonl; do
    [ -f "${F}" ] || continue
    mkdir -p "${DEST}"
    if ! cmp -s "${F}" "${DEST}$(basename "${F}")" 2>/dev/null; then
      cp "${F}" "${DEST}"
      CHANGED=1
    fi
  done
done

# Separate adds with || true: a pathspec that matches nothing (e.g.
# results/ before the first eval lands) would otherwise abort the WHOLE
# add, silently dropping artifacts/ too (bit us at round-4 stage 1).
git add -A artifacts/ 2>/dev/null || true
[ -d results ] && git add -A results/ 2>/dev/null || true
if ! git diff --cached --quiet 2>/dev/null; then
  git commit -q -m "Harvest eval artifacts into results/ ($(date -u +%H:%M:%S))" \
    && echo "harvest: committed updated results" \
    || echo "harvest: commit failed (concurrent index use?); artifacts staged"
else
  echo "harvest: nothing new"
fi
