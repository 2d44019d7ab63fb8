"""GP-EI HPO on the unsupervised pipeline — the reference's exact claim
surface (``README.md:43-47``: Ax tuning of the unsup model lifted mean
accuracy; notebook space: num_timesteps, sampled_num, num_hidden_layers,
log-lr — ``find_best_hyperparams_for_dataset.ipynb`` cells 7-9).

Each trial trains the transductive unsup model and reports the best
epoch's 10-fold logistic accuracy of pooled embeddings.  PTC/MUTAG trials
cost ~30-60 s on the chip, so a 12-trial loop is minutes.

Writes runs/hpo/hpo_real_unsup_<dataset>.jsonl.
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
from graph_transformer_tpu.exp.hpo import optimize
from graph_transformer_tpu.train.unsup_trainer import UnsupTrainer

SPACE = [
    {"name": "num_timesteps", "type": "range", "bounds": [1, 4]},
    {"name": "num_neighbors", "type": "choice", "values": [4, 8, 16]},
    {"name": "sampled_num", "type": "choice", "values": [128, 256, 512]},
    {"name": "learning_rate", "type": "range", "bounds": [3e-5, 3e-3],
     "log_scale": True},
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="PTC")
    ap.add_argument("--trials", type=int, default=12)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--eval_every", type=int, default=2)
    ap.add_argument("--permute_graphs", type=int, default=None,
                    metavar="SEED",
                    help="leak-free protocol (see data.tu.permute_graphs / "
                         "scripts/unsup_leak_control.py)")
    args = ap.parse_args()
    suffix = (f"_perm{args.permute_graphs}"
              if args.permute_graphs is not None else "")
    out_path = f"runs/hpo/hpo_real_unsup_{args.dataset}{suffix}.jsonl"
    os.makedirs("runs/hpo", exist_ok=True)
    out_f = open(out_path, "a")
    ds = load_tu_dataset(args.dataset)
    if args.permute_graphs is not None:
        from graph_transformer_tpu.data.tu import permute_graphs

        ds = permute_graphs(ds, seed=args.permute_graphs)

    cache = {}

    def evaluate(params):
        key = json.dumps(params, sort_keys=True)
        if key in cache:
            return cache[key]
        cfg = ExperimentConfig(
            data=DataConfig(
                dataset=args.dataset, batch_size=2,
                num_neighbors=int(params["num_neighbors"]),
            ),
            model=ModelConfig(
                num_timesteps=int(params["num_timesteps"]),
                num_hidden_layers=1, ff_hidden_size=1024,
                sampled_num=int(params["sampled_num"]),
            ),
            train=TrainConfig(
                learning_rate=float(params["learning_rate"]),
                num_epochs=args.epochs, scan_epochs=True,
                eval_every=args.eval_every,
            ),
        )
        t0 = time.time()
        trainer = UnsupTrainer(ds, cfg)
        best = 0.0
        for epoch in range(1, args.epochs + 1):
            trainer.train_epoch_stacked()
            if epoch % args.eval_every == 0:
                mean, _ = trainer.evaluate()
                best = max(best, mean)
        out_f.write(json.dumps({
            "params": params, "best": round(best, 4),
            "wall_s": round(time.time() - t0, 1),
        }) + "\n")
        out_f.flush()
        cache[key] = best
        return best

    # the README unsup config as the baseline arm
    base = {
        "num_timesteps": 2 if args.dataset == "PTC" else 1,
        "num_neighbors": 4 if args.dataset == "PTC" else 8,
        "sampled_num": 512,
        "learning_rate": 1e-4,
    }
    base_acc = evaluate(base)
    print(f"README config: {base_acc:.4f}", flush=True)

    best_params, best_value, _ = optimize(
        SPACE, evaluate, total_trials=args.trials, seed=0, strategy="gp",
    )
    rec = {
        "summary": True, "dataset": args.dataset, "epochs": args.epochs,
        "readme_acc": round(base_acc, 4), "best_acc": round(best_value, 4),
        "gain": round(best_value - base_acc, 4), "best_params": best_params,
    }
    out_f.write(json.dumps(rec) + "\n")
    out_f.close()
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
