"""Round-3 Pallas-path accuracy matrix: full 10-fold CV on the fused
kernels for MULTIPLE datasets via the fold-vmapped runner.

Round 2 could only prove Pallas accuracy parity on a single sequential
MUTAG run (the kernels' scalar-prefetch seeds blocked fold-vmapping).
Round 3 made the kernels vmap-native, so the fold-parallel runner now
measures the EXACT configuration the benchmark runs (use_pallas +
bfloat16) with full 10-fold CV per dataset, against the XLA-f32 numbers
recorded in runs/tenfold_all (RESULTS.md).

Parity bar: |mean_pallas − mean_xla| ≤ 0.04 (≈2 test graphs on MUTAG —
the round-2 threshold).

Writes runs/pallas_parity_r3.json.  Run on the real chip.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from graph_transformer_tpu.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from graph_transformer_tpu.data.tu import load_tu_dataset
from graph_transformer_tpu.train.tenfold_vmap import TenfoldVmapRunner

# README configs (the same rows runs/tenfold_all measured on the XLA path)
CONFIGS = {
    "MUTAG": dict(batch=4, K=8, T=4, epochs=50),
    "PTC": dict(batch=4, K=16, T=3, epochs=50),
}


def xla_reference(name):
    path = os.path.join("runs/tenfold_all/results_r2.jsonl")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            if r.get("dataset") == name:
                return r
    return None


def main():
    out = {}
    for name, c in CONFIGS.items():
        ds = load_tu_dataset(name)
        cfg = ExperimentConfig(
            data=DataConfig(batch_size=c["batch"], num_neighbors=c["K"]),
            model=ModelConfig(
                num_timesteps=c["T"], num_hidden_layers=1,
                ff_hidden_size=1024, use_pallas=True,
                compute_dtype="bfloat16",
            ),
            train=TrainConfig(num_epochs=c["epochs"], learning_rate=5e-4),
        )
        t0 = time.time()
        runner = TenfoldVmapRunner(ds, cfg)
        best, mean, std = runner.run(
            log_fn=lambda m: print(f"[{name}] {m}", flush=True)
        )
        dt = time.time() - t0
        ref = xla_reference(name)
        gap = abs(mean - ref["mean"]) if ref else None
        out[name] = {
            "pallas_bf16": {"mean": mean, "std": std,
                            "folds": best.tolist()},
            "xla_f32": ({"mean": ref["mean"], "std": ref["std"]}
                        if ref else None),
            "abs_gap": gap,
            "within_fold_noise": (gap is not None and gap <= 0.04),
            "config": c,
            "seconds": dt,
        }
        print(f"{name}: pallas {mean:.4f}±{std:.4f}"
              + (f" vs xla {ref['mean']:.4f} (gap {gap:.4f})" if ref else ""),
              flush=True)
    os.makedirs("runs", exist_ok=True)
    with open("runs/pallas_parity_r3.json", "w") as f:
        json.dump(out, f, indent=2)
    print("wrote runs/pallas_parity_r3.json")


if __name__ == "__main__":
    main()
