#!/bin/bash
# Round-4 chip queue, stage 5: fused-path accuracy gate + A/B rerun.
set -x
cd "$(dirname "$0")/.."
mkdir -p runs

echo "=== 1. Fused-sampler path accuracy gate (MUTAG + PTC CV) ==="
timeout 7000 python scripts/hybrid_cv_parity.py --fused_sampler

echo "=== 2. Fused sample+gather+encode A/B rerun (fixed harness) ==="
timeout 2500 python scripts/bench_fused_sampler.py

echo "=== 3. Headline bench (fused path) x2 for run-to-run spread ==="
GT_FUSED_SAMPLER=1 timeout 900 python bench.py
GT_FUSED_SAMPLER=1 timeout 900 python bench.py

echo "=== r4 queue stage 5 done ==="
