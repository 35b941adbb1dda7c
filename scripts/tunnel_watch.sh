#!/usr/bin/env bash
# Probe the axon TPU tunnel until it answers, then launch the round-4
# chain. Written for the observed outage mode (CLAUDE.md): backend init
# blocks indefinitely or raises UNAVAILABLE; a blocked probe uses ~no CPU,
# so polling is free while CPU work continues. timeout -k covers probes
# stuck in uninterruptible RPC (SIGTERM ignored -> SIGKILL).
# Launch: bash scripts/tunnel_watch.sh >> /tmp/round4.log 2>&1 &
cd "$(dirname "${BASH_SOURCE[0]}")/.."
export PYTHONPATH="$(pwd):/root/.axon_site"

ATTEMPT=0
while true; do
  ATTEMPT=$((ATTEMPT + 1))
  echo "--- tunnel probe #${ATTEMPT} $(date -u +%H:%M:%S)"
  if timeout -k 30 420 python -c "
import jax
d = jax.devices()[0]
assert d.platform == 'tpu', d
print('tunnel OK:', d)
"; then
    echo "--- tunnel up at $(date -u +%H:%M:%S); launching round-4 chain"
    break
  fi
  echo "--- still down; sleeping 180s"
  sleep 180
done

bash scripts/round4_chain.sh
