"""End-to-end multiplex node-embedding measurement on the real NGs.mat.

The fork's headline extension: multilayer (multiplex) U2GNN node embeddings
+ arithmetic- vs geometric-mean-Laplacian spectral clustering, on the ONE
real multiplex dataset shipped in the reference checkout
(``code_m/data/NGs.mat`` — 500 newsgroup documents, 3 views, 5 classes).

Protocol mirrors ``run_node_classification.py:13-69`` and the
``code_m/Multilayer_GeometricMean.ipynb`` cells 12-18: size_x=30 PCA/scaled
features, kNN-40 similarity layers, K=12 neighbors, T=20, 2 hidden layers,
ff 1024, dropout 0.2, 30 epochs, kmeans eval — run for every
(siamese|multi) x (contrastive|gae) combination, then the spectral
baselines on the same Laplacians.

Writes runs/multiplex_ngs.json.  CPU-friendly (500 nodes).

Run: python scripts/run_multiplex_ngs.py [--epochs 30] [--lr 0.01]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NGS_PATH = os.environ.get("GT_NGS_PATH", "/root/reference/code_m/data/NGs.mat")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--out", default="runs/multiplex_ngs.json")
    args = ap.parse_args()

    from graph_transformer_tpu.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )
    from graph_transformer_tpu.data.multiplex import load_multiplex
    from graph_transformer_tpu.train.ml_node_trainer import MultiplexNodeTrainer

    # reference protocol: run_node_classification.py:13-34 (size_x 30,
    # kNN-40 similarity layer per view, scale_features, 10% train masks)
    ds = load_multiplex(
        "mat_multiview", mat_path=NGS_PATH, size_x=30,
        num_similarity_neighbors=40, scale_features=True,
        train_fraction=0.10, seed=0,
    )
    print(f"NGs: {ds.num_nodes} nodes, {ds.num_views} views, "
          f"{ds.num_classes} classes, feature dim {ds.feature_dim}")

    results = {"dataset": "NGs.mat", "nodes": ds.num_nodes,
               "views": ds.num_views, "classes": ds.num_classes,
               "protocol": {"size_x": 30, "knn": 40, "K": 12, "T": 20,
                            "hidden_layers": 2, "ff": 1024, "dropout": 0.2,
                            "epochs": args.epochs, "lr": args.lr},
               "runs": {}, "spectral": {}}

    for ml_type in ("siamese", "multi"):
        for loss_type in ("contrastive", "gae"):
            tag = f"{ml_type}_{loss_type}"
            cfg = ExperimentConfig(
                data=DataConfig(num_neighbors=12),
                model=ModelConfig(
                    model="ml_u2gnn", ff_hidden_size=1024, num_timesteps=20,
                    num_hidden_layers=2, dropout=0.2, loss_type=loss_type,
                    ml_model_type=ml_type, projection_dim=-1,
                ),
                train=TrainConfig(
                    num_epochs=args.epochs, learning_rate=args.lr,
                    eval_every=5,
                ),
            )
            trainer = MultiplexNodeTrainer(ds, cfg)
            best = None
            for epoch in range(1, args.epochs + 1):
                loss = trainer.train_epoch()
                if epoch % 5 == 0 or epoch == args.epochs:
                    m = trainer.evaluate_kmeans()
                    logi = trainer.evaluate_logistic()
                    m["logistic"] = float(logi)
                    if best is None or m["accuracy"] > best["accuracy"]:
                        best = m
                    print(f"[{tag}] epoch {epoch:03d} loss {loss:12.4f} "
                          + " ".join(f"{k}={v:.4f}" for k, v in m.items()))
            results["runs"][tag] = {k: float(v) for k, v in best.items()}

    # spectral baselines (same Laplacians the trained runs used)
    from graph_transformer_tpu.utils.laplacian import (
        arithmetic_mean_laplacian,
        geometric_mean_laplacian,
    )
    from graph_transformer_tpu.utils.metrics import spectral_eval_from_laplacian

    am = arithmetic_mean_laplacian(ds.lap)
    gm = geometric_mean_laplacian(ds.lap)
    for name, L in (("arithmetic_mean", am), ("geometric_mean", gm)):
        m = spectral_eval_from_laplacian(L, ds.labels, ds.num_classes)
        results["spectral"][name] = {k: float(v) for k, v in m.items()}
        print(f"spectral[{name}]: "
              + " ".join(f"{k}={v:.4f}" for k, v in m.items()))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
