#!/bin/bash
# Detached TPU-pool watcher: probe every 10 minutes; when the backend
# answers, run the given measurement queue ONCE and exit. Never kills
# by pattern; bounded probes only (the outage mode is an init hang).
#
# Usage: nohup bash benchmarks/tpu_watch.sh benchmarks/tpu_round5c.sh \
#          >> /tmp/tpu_watch_r5c.log 2>&1 & echo $! > /tmp/tpu_watch.pid
set -u
cd "$(dirname "$0")/.."
QUEUE=${1:?queue script}
while true; do
  echo "probe $(date -u +%FT%TZ)"
  if timeout 300 python -c "import jax; print(jax.devices())" \
      > /dev/null 2>&1; then
    echo "backend up $(date -u +%FT%TZ) — running $QUEUE"
    bash "$QUEUE"
    echo "queue finished $(date -u +%FT%TZ)"
    exit 0
  fi
  sleep 600
done
