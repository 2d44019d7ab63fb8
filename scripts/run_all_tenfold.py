"""Full 10-fold CV on every TU dataset in the reference checkout.

The BASELINE north star asks for 10-fold accuracy on all TU datasets; the
fold-vmapped runner (train/tenfold_vmap.py) makes that affordable on one
chip — all 10 folds train as one device program per epoch.

Config: the reference README publishes per-dataset configs only for
IMDBBINARY and PTC (`README.md:37-39`); every other dataset runs the
IMDBBINARY-shaped config (batch 4, K=8, T=4, ff 1024, lr 5e-4, 50 epochs).
Appends one JSON line per dataset to --out (resumable: finished datasets
are skipped).
"""

from __future__ import annotations

import argparse
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

# dataset -> (num_neighbors K, num_timesteps T); README.md:37-39 for
# IMDBBINARY/PTC, IMDBBINARY-shaped default elsewhere
CONFIGS = {
    "MUTAG": (8, 4),
    "PTC": (16, 3),
    "PROTEINS": (8, 4),
    "ENZYMES": (8, 4),
    "IMDBBINARY": (8, 4),
    "IMDBMULTI": (8, 4),
    "NCI1": (8, 4),
    "NCI109": (8, 4),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/tenfold_all/results.jsonl")
    ap.add_argument("--datasets", default=",".join(CONFIGS))
    ap.add_argument("--num_epochs", default=50, type=int)
    ap.add_argument("--budget_s", default=10**9, type=float)
    ap.add_argument("--runner", default="ondevice", choices=["vmap", "ondevice"])
    args = ap.parse_args()
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)

    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            done = {json.loads(line)["dataset"] for line in f}

    t0 = time.time()
    for name in args.datasets.split(","):
        if name in done:
            print(f"skip {name} (done)", flush=True)
            continue
        if time.time() - t0 > args.budget_s:
            print("budget reached", flush=True)
            break
        K, T = CONFIGS[name]
        cfg = ExperimentConfig(
            data=DataConfig(dataset=name, batch_size=4, num_neighbors=K),
            model=ModelConfig(
                num_timesteps=T, num_hidden_layers=1, ff_hidden_size=1024
            ),
            train=TrainConfig(
                learning_rate=5e-4, num_epochs=args.num_epochs
            ),
        )
        ds = load_tu_dataset(name)
        t1 = time.time()
        if args.runner == "ondevice":
            from graph_transformer_tpu.train.cv_ondevice import run_cv_on_device

            accs, mean, std = run_cv_on_device(ds, cfg)
        else:
            accs, mean, std = TenfoldVmapRunner(ds, cfg).run(
                log_fn=lambda s: print(f"  [{name}] {s}", flush=True)
            )
        rec = {
            "dataset": name,
            "mean": round(mean, 4),
            "std": round(std, 4),
            "accs": [round(float(a), 4) for a in accs],
            "K": K,
            "T": T,
            "epochs": args.num_epochs,
            "wall_s": round(time.time() - t1, 1),
        }
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
