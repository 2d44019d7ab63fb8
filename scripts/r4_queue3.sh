#!/bin/bash
# Round-4 chip queue, stage 3: kernel A/B + profile + protocol experiment.
#   nohup bash scripts/r4_queue3.sh > runs/r4_queue3.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p runs

echo "=== 1. Fused sample+gather+encode: parity gate + A/B ==="
timeout 2500 python scripts/bench_fused_sampler.py

echo "=== 2. Current step profile ==="
timeout 2500 python scripts/profile_focus.py || true

echo "=== 3. bench.py A/B: two-pass vs fused sampler ==="
timeout 900 python bench.py
GT_FUSED_SAMPLER=1 timeout 900 python bench.py

echo "=== 4. Selection-protocol experiment (PTC + MUTAG control) ==="
for attempt in 1 2; do
  timeout 8000 python scripts/ptc_protocol.py && break
  echo "ptc_protocol attempt $attempt failed (rc=$?), retrying"
  sleep 10
done

echo "=== r4 queue stage 3 done ==="
