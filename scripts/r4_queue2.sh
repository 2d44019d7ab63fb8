#!/bin/bash
# Round-4 chip queue, stage 2.
#   nohup bash scripts/r4_queue2.sh > runs/r4_queue2.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p runs

echo "=== 1. Baseline node pipelines (karate sampled_num fixed) ==="
for attempt in 1 2 3; do
  timeout 4000 python scripts/baseline_models_r3.py && break
  echo "baseline_models attempt $attempt failed (rc=$?), retrying"
  sleep 10
done

echo "=== 2. Unsup file-order leak control (round-4 finding) ==="
for attempt in 1 2 3; do
  timeout 9000 python scripts/unsup_leak_control.py && break
  echo "unsup_leak_control attempt $attempt failed (rc=$?), retrying"
  sleep 10
done

echo "=== 3. Halo chip anchor (S=1 compute term, current code) ==="
timeout 2000 python scripts/bench_halo.py --mode chip

echo "=== r4 queue stage 2 done ==="
