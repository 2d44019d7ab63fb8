#!/bin/bash
# Round-2 TPU job queue: waits for the 8-dataset accuracy matrix to finish,
# then runs the remaining chip jobs strictly sequentially (one chip, and the
# 2-core host must not be shared during timed benches).
set -u
cd "$(dirname "$0")/.."
LOG=runs/r2_queue.log
mkdir -p runs
echo "=== r2 queue start $(date) ===" >> "$LOG"

# 1. wait for the matrix (8 unique datasets in the results file)
for i in $(seq 1 400); do
  n=$(python - <<'EOF'
import json
try:
    print(len({json.loads(l)["dataset"] for l in open("runs/tenfold_all/results_r2.jsonl")}))
except FileNotFoundError:
    print(0)
EOF
)
  if [ "$n" -ge 8 ]; then break; fi
  sleep 60
done
echo "matrix datasets done: $n at $(date)" >> "$LOG"

run() {
  echo "--- $* @ $(date)" >> "$LOG"
  timeout 7200 "$@" >> "$LOG" 2>&1
  echo "--- rc=$? @ $(date)" >> "$LOG"
}

# 2. cheap measurement jobs first
run python scripts/roofline.py
run python bench.py
run python scripts/pallas_parity_cv.py

# 3. unsupervised breadth (IMDBBINARY, PTC, MUTAG, IMDBMULTI)
run python scripts/run_unsup_all.py --out runs/unsup_all/results_r2.jsonl

# 4. re-sweeps under the fixed LR schedule
run python scripts/sweep_vmap.py --dataset PTC_r2 --runner ondevice \
    --out runs/sweep_vmap_r2/PTC_r2.jsonl
run python scripts/sweep_vmap.py --dataset MUTAG_r2 --runner ondevice \
    --out runs/sweep_vmap_r2/MUTAG_r2.jsonl

# 5. torch reference matched-config bench (pure CPU; last so it never
#    contends with a TPU-timed job)
run python scripts/bench_torch_reference.py --batch 16 --steps 3
run python scripts/bench_torch_reference.py --batch 4 --steps 3

echo "=== r2 queue done $(date) ===" >> "$LOG"

# 6. real-workload GP-HPO (appended while queue runs; bash reads lazily)
run python scripts/hpo_real.py --trials 12 --epochs 25
echo "=== r2 queue tail done $(date) ===" >> "$LOG"

# 7. PROTEINS gap probes
run python scripts/sweep_vmap.py --dataset PROTEINS_r2 --runner ondevice \
    --out runs/sweep_vmap_r2/PROTEINS_r2.jsonl
run python scripts/make_results.py
echo "=== r2 queue tail2 done $(date) ===" >> "$LOG"
