#!/bin/bash
# Round-4 chip queue, stage 6: the reference's HPO claim surface, leak-free.
set -x
cd "$(dirname "$0")/.."
mkdir -p runs

echo "=== IMDBBINARY unsup GP-HPO under the permuted (leak-free) protocol ==="
for attempt in 1 2 3; do
  timeout 9000 python scripts/hpo_real_unsup.py --dataset IMDBBINARY \
    --trials 10 --epochs 30 --permute_graphs 1 && break
  echo "hpo attempt $attempt failed (rc=$?), retrying"
  sleep 10
done

echo "=== r4 queue stage 6 done ==="
