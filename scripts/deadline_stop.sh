#!/usr/bin/env bash
# Hard-stop all TPU queue work at an absolute epoch time so the driver's
# end-of-round bench.py gets the chip (and the tpu_lock) to itself.
# The chain is launched as a setsid process-group leader whose PID is in
# /tmp/chain_watch.pid; killing the negative PGID takes down the watcher,
# the chain, and any in-flight trainer (the kernel releases its flock).
# Never kills by pattern.  Usage: deadline_stop.sh <stop_epoch>
set -u
STOP_AT="${1:?usage: deadline_stop.sh <stop_epoch>}"
cd "$(dirname "${BASH_SOURCE[0]}")/.."

NOW="$(date +%s)"
while [ "${NOW}" -lt "${STOP_AT}" ]; do
  REMAIN=$((STOP_AT - NOW))
  SLEEP=$((REMAIN < 60 ? REMAIN : 60))
  sleep "${SLEEP}"
  NOW="$(date +%s)"
done

echo "--- deadline reached $(date -u +%H:%M:%S); stopping TPU queue"
touch /tmp/chain_stop
if [ -f /tmp/chain_watch.pid ]; then
  PGID="$(cat /tmp/chain_watch.pid)"
  kill -TERM -- "-${PGID}" 2>/dev/null && sleep 20
  kill -KILL -- "-${PGID}" 2>/dev/null
fi
sleep 5
bash scripts/harvest_results.sh
echo "--- deadline stop complete $(date -u +%H:%M:%S)"
