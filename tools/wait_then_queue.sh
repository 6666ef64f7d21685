#!/bin/bash
# Wait for the axon TPU tunnel to answer (tools/tpu_probe.py polls every
# --interval s, up to --max-minutes), then run the round-4 measurement queue.
# Intended for background use:
#   bash tools/wait_then_queue.sh >> exp_results/round4_queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
if python tools/tpu_probe.py --interval 240 --max-minutes "${MAX_WAIT_MIN:-360}"; then
  echo "=== TPU up at $(date -u +%H:%M:%S); starting queue"
  exec bash tools/round4_queue.sh
fi
echo "=== TPU never came up; queue not started"
exit 1
