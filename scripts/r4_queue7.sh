#!/bin/bash
# Round-4 chip queue, stage 7: leak-control coverage extension, under the
# stall watchdog (scripts/watchdog_run.sh).
set -x
cd "$(dirname "$0")/.."
mkdir -p runs
bash scripts/watchdog_run.sh 600 6 runs/r4_queue7_inner.log \
  python scripts/unsup_leak_control.py --datasets PROTEINS IMDBMULTI
echo "=== r4 queue stage 7 done ==="
