#!/bin/bash
# Round-4 chip measurement queue, stage 1 (sequential — one TPU process at
# a time).  Run from the repo root:
#   nohup bash scripts/r4_queue.sh > runs/r4_queue.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p runs

echo "=== 1. Baseline models (unsup GCN graph cls + node pipelines) ==="
# Process-level elastic: the script resumes at row granularity, so retries
# after a preemption skip completed rows (VERDICT r3 item 2).
for attempt in 1 2 3; do
  timeout 6000 python scripts/baseline_models_r3.py && break
  echo "baseline_models attempt $attempt failed (rc=$?), retrying"
  sleep 10
done

echo "=== 2. Hybrid-kernel 10-fold accuracy parity (ADVICE r3 medium) ==="
for attempt in 1 2; do
  timeout 7000 python scripts/hybrid_cv_parity.py && break
  echo "hybrid_cv_parity attempt $attempt failed (rc=$?), retrying"
  sleep 10
done

echo "=== r4 queue stage 1 done ==="
