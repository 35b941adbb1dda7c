#!/usr/bin/env bash
# Generic tunnel watcher: probe the axon TPU backend until it answers, then
# launch the given chain script; if the chain dies (tunnel drop mid-run),
# re-probe and relaunch -- every chain unit skips work whose artifact
# already exists, so a relaunch costs seconds. Supersedes the hardcoded
# tunnel_watch.sh (kept for round4_chain.sh compatibility).
#
#   bash scripts/chain_watch.sh scripts/round4b_chain.sh >> /tmp/round4b.log 2>&1 &
# Stop cleanly:  touch /tmp/chain_stop   (checked between probes/launches)
cd "$(dirname "${BASH_SOURCE[0]}")/.."
export PYTHONPATH="$(pwd):/root/.axon_site"
CHAIN="${1:?usage: chain_watch.sh <chain-script>}"
STOP="${CHAIN_STOP_FILE:-/tmp/chain_stop}"
DONE="/tmp/$(basename "${CHAIN}" .sh)_done"
rm -f "${DONE}"
# A stop file is a one-shot signal aimed at a RUNNING watcher (deadline_stop
# touches it). Launching a new watcher supersedes it; without this, a
# relaunch after a deadline stop silently does nothing (ADVICE r4).
if [ -f "${STOP}" ]; then
  echo "--- removing stale stop file from a previous run (${STOP})"
  rm -f "${STOP}"
fi

# Self-record the watcher's PID (== its PGID/SID under the documented
# setsid launch) so deadline_stop.sh's `kill -- -PGID` hits the real
# group. The old convention (`echo $! > /tmp/chain_watch.pid` at launch)
# recorded the setsid wrapper's PID, which dies immediately -- observed
# round 5: file said 1549, real PGID was 1553, so the deadline kill would
# have been a no-op.
echo $$ > "${CHAIN_WATCH_PID_FILE:-/tmp/chain_watch.pid}"

ATTEMPT=0
while [ ! -f "${DONE}" ]; do
  if [ -f "${STOP}" ]; then echo "--- stop file present; exiting"; exit 0; fi
  ATTEMPT=$((ATTEMPT + 1))
  echo "--- tunnel probe #${ATTEMPT} $(date -u +%H:%M:%S)"
  if timeout -k 30 420 python -c "
import jax
d = jax.devices()[0]
assert d.platform == 'tpu', d
print('tunnel OK:', d)
"; then
    if [ -f "${STOP}" ]; then echo "--- stop file present; exiting"; exit 0; fi
    echo "--- tunnel up at $(date -u +%H:%M:%S); launching ${CHAIN}"
    if bash "${CHAIN}"; then
      touch "${DONE}"
      echo "--- chain completed $(date -u +%H:%M:%S)"
    else
      echo "--- chain exited nonzero $(date -u +%H:%M:%S); will re-probe"
      sleep 60
    fi
  else
    echo "--- still down; sleeping 180s"
    sleep 180
  fi
done
