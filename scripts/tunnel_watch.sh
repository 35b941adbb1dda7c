#!/usr/bin/env bash
# Probe the axon TPU tunnel until it answers, then launch the round-4
# chain; if the chain dies (e.g. the tunnel drops mid-run), go back to
# probing and relaunch -- every chain stage skips work whose artifact
# already exists, so a relaunch costs seconds. Written for the observed
# outage mode (CLAUDE.md): backend init blocks indefinitely or raises
# UNAVAILABLE; a blocked probe uses ~no CPU, so polling is free while CPU
# work continues. timeout -k covers probes stuck in uninterruptible RPC.
#
# Stop cleanly:  touch /tmp/round4_stop   (checked between probes/launches)
# Launch: bash scripts/tunnel_watch.sh >> /tmp/round4.log 2>&1 &
cd "$(dirname "${BASH_SOURCE[0]}")/.."
export PYTHONPATH="$(pwd):/root/.axon_site"

STOP=/tmp/round4_stop
DONE=/tmp/round4_chain_done
rm -f "${DONE}"

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
    echo "--- tunnel up at $(date -u +%H:%M:%S); launching round-4 chain"
    if bash scripts/round4_chain.sh; then
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
