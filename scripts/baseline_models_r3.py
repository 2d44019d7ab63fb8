"""Baseline-model results (VERDICT round-2 item 4): the U2GNN-vs-baseline
comparisons the fork exists to make, measured end-to-end.

1. Unsupervised GCN graph classification (≙ the reference's TF baseline,
   ``gcn_baseline/train_unsup_gcn.py:173-203``): concat GCN layer outputs →
   sampled softmax over all nodes → best-epoch pooled-embedding 10-fold
   logistic accuracy — same metric and protocol as the U2GNN unsup rows in
   RESULTS.md (runs/unsup_all).
2. Node-classification pipelines (≙ ``node_train_utils.py``): u2gnn / gcn /
   gat encoders on karate and a 4-block SBM, transductive training + mask
   logistic probe.

Writes runs/baselines_r3.json.  Chip: ~15-30 min.
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
from graph_transformer_tpu.data.citation import load_node_dataset
from graph_transformer_tpu.data.tu import load_tu_dataset
from graph_transformer_tpu.train.node_trainer import train_evaluate_node
from graph_transformer_tpu.train.unsup_trainer import train_evaluate_unsup

# README unsup configs (same rows as runs/unsup_all measured for U2GNN)
UNSUP_CONFIGS = {
    "MUTAG": dict(batch=2, K=8, T=1, epochs=50),
    "PTC": dict(batch=2, K=4, T=2, epochs=50),
    "IMDBBINARY": dict(batch=2, K=8, T=1, epochs=50),
}


RESULTS_PATH = "runs/baselines_r3.json"


def _dump(out, path=RESULTS_PATH):
    os.makedirs("runs", exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


def _load_existing():
    """Row-level resume: retries under the elastic supervisor skip rows
    already measured (the round-3 queue preemption lost everything because
    this didn't exist)."""
    if os.path.exists(RESULTS_PATH):
        with open(RESULTS_PATH) as f:
            prev = json.load(f)
        return {"gcn_unsup": prev.get("gcn_unsup", {}),
                "node": prev.get("node", {})}
    return {"gcn_unsup": {}, "node": {}}


def gcn_unsup_rows(out):
    for name, c in UNSUP_CONFIGS.items():
        if name in out["gcn_unsup"]:
            print(f"gcn_unsup {name}: already measured, skipping", flush=True)
            continue
        ds = load_tu_dataset(name)
        cfg = ExperimentConfig(
            data=DataConfig(batch_size=c["batch"], num_neighbors=c["K"]),
            model=ModelConfig(
                model="gcn_unsup", num_timesteps=c["T"],
                num_hidden_layers=2, ff_hidden_size=1024,
                sampled_num=512,
            ),
            train=TrainConfig(num_epochs=c["epochs"], learning_rate=1e-4,
                              eval_every=2, scan_epochs=True),
        )
        t0 = time.time()
        r = train_evaluate_unsup(
            ds, cfg, log_fn=lambda m: print(f"[gcn_unsup {name}] {m}",
                                            flush=True)
        )
        out["gcn_unsup"][name] = {
            "best_mean": r["best_mean"], "best_std": r["best_std"],
            "config": c, "seconds": time.time() - t0,
        }
        print(f"gcn_unsup {name}: {r['best_mean']:.4f}±{r['best_std']:.4f}",
              flush=True)
        _dump(out)


def node_rows(out):
    for ds_name in ("karate", "sbm"):
        ds = load_node_dataset(ds_name)
        for model in ("u2gnn", "gcn", "gat"):
            if f"{ds_name}_{model}" in out["node"]:
                print(f"node {ds_name} {model}: already measured, skipping",
                      flush=True)
                continue
            # sampled_num must stay below the node vocabulary (karate: 34)
            nsamp = min(64, max(8, ds.num_nodes // 2))
            cfg = ExperimentConfig(
                data=DataConfig(num_neighbors=8),
                model=ModelConfig(
                    model=model, num_timesteps=2, num_hidden_layers=2,
                    ff_hidden_size=256, sampled_num=nsamp, loss_type="default",
                ),
                train=TrainConfig(num_epochs=40, learning_rate=1e-3,
                                  eval_every=4),
            )
            t0 = time.time()
            r = train_evaluate_node(
                ds, cfg, eval_mode="masks",
                log_fn=lambda m: print(f"[{ds_name} {model}] {m}",
                                       flush=True),
            )
            out["node"][f"{ds_name}_{model}"] = {
                "best_metric": r["best_metric"],
                "seconds": time.time() - t0,
            }
            print(f"node {ds_name} {model}: {r['best_metric']:.4f}",
                  flush=True)
            _dump(out)


def main():
    out = _load_existing()
    gcn_unsup_rows(out)
    node_rows(out)
    _dump(out)
    print("wrote runs/baselines_r3.json")


if __name__ == "__main__":
    main()
