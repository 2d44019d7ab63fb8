"""Unsupervised U2GNN accuracy breadth: embeddings + logistic probe per
dataset (VERDICT missing-item 5 / next-round item 9).

Configs: the reference README publishes unsup commands for IMDBBINARY
(bs 2, K=8, T=1, lr 1e-4, sampled 512) and PTC (bs 2, K=4, T=2, lr 1e-4,
sampled 512) — ``README.md:49-51``; other datasets run the IMDBBINARY-shaped
config.  Transductive over all graphs; the metric is the best epoch's
10-fold logistic accuracy of sum-pooled node embeddings (the reference
protocol, ``train_pytorch_U2GNN_UnSup.py:164-188``).

Appends one JSON line per dataset to --out (resumable).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_transformer_tpu.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from graph_transformer_tpu.data.tu import load_tu_dataset
from graph_transformer_tpu.train.unsup_trainer import UnsupTrainer

# dataset -> (K, T); README.md:49-51 where published
CONFIGS = {
    "IMDBBINARY": (8, 1),
    "PTC": (4, 2),
    "MUTAG": (8, 1),
    "IMDBMULTI": (8, 1),
    "PROTEINS": (8, 1),
    "ENZYMES": (8, 1),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/unsup_all/results.jsonl")
    ap.add_argument("--datasets", default="IMDBBINARY,PTC,MUTAG,IMDBMULTI")
    ap.add_argument("--num_epochs", default=50, type=int)
    ap.add_argument("--eval_every", default=2, type=int)
    ap.add_argument("--budget_s", default=10**9, type=float)
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
            data=DataConfig(dataset=name, batch_size=2, num_neighbors=K),
            model=ModelConfig(
                num_timesteps=T, num_hidden_layers=1, ff_hidden_size=1024,
                sampled_num=512,
            ),
            train=TrainConfig(
                learning_rate=1e-4, num_epochs=args.num_epochs,
                eval_every=args.eval_every, scan_epochs=True,
            ),
        )
        ds = load_tu_dataset(name)
        trainer = UnsupTrainer(ds, cfg)
        t1 = time.time()
        best_mean, best_std, best_epoch = 0.0, 0.0, 0
        for epoch in range(1, cfg.train.num_epochs + 1):
            loss = trainer.train_epoch_stacked()
            if epoch % cfg.train.eval_every == 0:
                mean, std = trainer.evaluate()
                if mean > best_mean:
                    best_mean, best_std, best_epoch = mean, std, epoch
                print(f"  [{name}] epoch {epoch:03d} | loss {loss:12.2f} | "
                      f"acc {mean:.4f}±{std:.4f}", flush=True)
        rec = {
            "dataset": name,
            "mean": round(best_mean, 4),
            "std": round(best_std, 4),
            "best_epoch": best_epoch,
            "K": K, "T": T, "epochs": args.num_epochs,
            "wall_s": round(time.time() - t1, 1),
        }
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
