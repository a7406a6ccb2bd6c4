#!/bin/bash
# Wait for the TPU tunnel to come back, then run the round-4 chip queue.
# Launch: setsid bash scripts/r4_wait_and_run.sh > results/r4_wait.log 2>&1 &
cd "$(dirname "$0")/.."
mkdir -p results
while true; do
  if timeout 90 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    echo "[wait] tunnel is UP at $(date -u +%H:%M:%S) — starting queue"
    touch results/QUEUE_STARTED
    exec bash scripts/r4_chip_queue.sh
  fi
  echo "[wait] tunnel still down at $(date -u +%H:%M:%S)"
  sleep 180
done
