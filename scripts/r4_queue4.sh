#!/bin/bash
# Round-4 chip queue, stage 4.
set -x
cd "$(dirname "$0")/.."
mkdir -p runs

echo "=== 1. Fused sample+gather+encode A/B (codebook generalization) ==="
timeout 2500 python scripts/bench_fused_sampler.py

echo "=== 2. bench.py with the fused sampler ==="
GT_FUSED_SAMPLER=1 timeout 900 python bench.py

echo "=== 3. remaining unsup leak-control rows (IMDBBINARY + PTC gcn) ==="
for attempt in 1 2 3 4; do
  timeout 9000 python scripts/unsup_leak_control.py && break
  echo "unsup_leak_control attempt $attempt failed (rc=$?), retrying"
  sleep 10
done

echo "=== r4 queue stage 4 done ==="
