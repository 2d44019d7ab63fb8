"""Multiplex node-classification / clustering CLI.

Capability parity with ``run_node_classification.py`` (the fork's hard-coded
Namespace script): trains the multilayer siamese/multi U2GNN on a multiplex
dataset, evaluates by logistic probe or kmeans clustering, runs the
arithmetic- vs geometric-mean-Laplacian spectral baselines
(``run_node_classification.py:62-65``), and saves the embeddings ``.npy``
(``:68-69``).
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from graph_transformer_tpu.cli.common import base_parser, config_from_args
from graph_transformer_tpu.data.multiplex import MULTIPLEX_LOADERS, load_multiplex
from graph_transformer_tpu.train.ml_node_trainer import train_evaluate_multiplex


def main(argv=None):
    parser = base_parser("TPU-native multiplex node classification")
    parser.add_argument(
        "--ml_dataset", default="gaussian", help=f"one of {sorted(MULTIPLEX_LOADERS)}"
    )
    parser.add_argument("--ml_data_path", default=None,
                        help="file/folder for file-based multiplex loaders")
    parser.add_argument("--loss_type", default="contrastive",
                        choices=["contrastive", "gae"])
    parser.add_argument("--ml_model_type", default="siamese",
                        choices=["siamese", "multi"])
    parser.add_argument("--projection_dim", default=-1, type=int)
    parser.add_argument("--eval_mode", default="kmeans",
                        choices=["kmeans", "logistic"])
    parser.add_argument("--size_x", default=8, type=int,
                        help="feature dimension for the multiplex loaders")
    parser.add_argument("--spectral_baselines", action="store_true")
    parser.add_argument("--save_embeddings", default=None, help=".npy path")
    args = parser.parse_args(argv)

    cfg = config_from_args(args)
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model,
            loss_type=args.loss_type,
            ml_model_type=args.ml_model_type,
            projection_dim=args.projection_dim,
        )
    )

    kw = {}
    if args.ml_dataset == "gaussian":
        kw = {"size_x": args.size_x, "seed": 100}
    elif args.ml_data_path:
        key = (
            "data_folder"
            if args.ml_dataset in ("leskovec_ng_mat", "uci_mfeat")
            else "edges_path" if args.ml_dataset in ("vickers_chan",)
            else "mat_path" if args.ml_dataset == "mat_multiview"
            else "data_path"
        )
        kw = {key: args.ml_data_path, "size_x": args.size_x}
    ds = load_multiplex(args.ml_dataset, **kw)
    print(f"# multiplex data: {ds.num_nodes} nodes, {ds.num_views} views, "
          f"{ds.num_classes} classes, feature dim {ds.feature_dim}")

    out = train_evaluate_multiplex(ds, cfg, eval_mode=args.eval_mode)
    print(f"best {args.eval_mode} metric: {out['best_metric']:.4f}")

    if args.spectral_baselines:
        sp = out["trainer"].spectral_baselines()
        for name, metrics in sp.items():
            print(f"spectral[{name}]: " + ", ".join(
                f"{k}={v:.4f}" for k, v in metrics.items()
            ))

    if args.save_embeddings:
        emb = out["trainer"].node_embeddings()
        os.makedirs(os.path.dirname(os.path.abspath(args.save_embeddings)),
                    exist_ok=True)
        np.save(args.save_embeddings, emb)
        print(f"saved embeddings to {args.save_embeddings}")
    return out["best_metric"]


if __name__ == "__main__":
    main()
