#!/bin/bash
# Remaining round-2 chip jobs (restart after the bench hang; all resumable)
set -u
cd "$(dirname "$0")/.."
LOG=runs/r2_queue.log
echo "=== r2 queue2 start $(date) ===" >> "$LOG"
run() {
  echo "--- $* @ $(date)" >> "$LOG"
  timeout 5400 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? @ $(date)" >> "$LOG"
}
run python scripts/pallas_parity_cv.py
run python scripts/run_unsup_all.py --out runs/unsup_all/results_r2.jsonl
run python scripts/sweep_vmap.py --dataset PTC_r2 --runner ondevice \
    --out runs/sweep_vmap_r2/PTC_r2.jsonl
run python scripts/sweep_vmap.py --dataset MUTAG_r2 --runner ondevice \
    --out runs/sweep_vmap_r2/MUTAG_r2.jsonl
run python scripts/bench_torch_reference.py --batch 16 --steps 3
run python scripts/bench_torch_reference.py --batch 4 --steps 3
run python scripts/hpo_real.py --trials 12 --epochs 25
run python scripts/sweep_vmap.py --dataset PROTEINS_r2 --runner ondevice \
    --out runs/sweep_vmap_r2/PROTEINS_r2.jsonl
run python scripts/make_results.py
echo "=== r2 queue2 done $(date) ===" >> "$LOG"

# pallas parity (sequential runner — the kernel doesn't vmap over folds)
run python scripts/pallas_parity_cv.py
run python scripts/make_results.py
echo "=== r2 queue2 tail done $(date) ===" >> "$LOG"
