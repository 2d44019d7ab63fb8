#!/bin/bash
# Round-3 chip measurement queue (sequential — one TPU process at a time).
# Run from the repo root:  nohup bash scripts/r3_queue.sh > runs/r3_queue.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p runs

echo "=== 1. Pallas-path 10-fold accuracy (MUTAG + PTC, fold-vmapped) ==="
timeout 7000 python scripts/pallas_cv_r3.py

echo "=== 2. GP-HPO on IMDBBINARY unsupervised (the reference's +8% claim) ==="
timeout 9000 python scripts/hpo_real_unsup.py --dataset IMDBBINARY --trials 12

echo "=== 3. PTC supervised round-3 grid ==="
timeout 9000 python scripts/sweep_vmap.py --dataset PTC_r3 --out runs/sweep_vmap_r2/PTC_r3.jsonl

echo "=== 4. Baseline models (unsup GCN graph cls + node pipelines) ==="
timeout 5000 python scripts/baseline_models_r3.py

echo "=== 5. Halo regime-2 chip anchor (S=1) ==="
timeout 2000 python scripts/bench_halo.py --mode chip

echo "=== r3 queue done ==="
