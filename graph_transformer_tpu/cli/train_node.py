"""Single-graph node-classification CLI.

Capability parity with the reference's citation-graph pipeline
(``node_train_utils.py``): trains a u2gnn / gcn / gat encoder transductively
over one graph (karate, synthetic SBM, or a Planetoid citation graph) with
the sampled-softmax / GAE / contrastive loss heads, and evaluates the node
embeddings by a train/test-mask logistic probe, 2-fold logistic regression
(``node_train_utils.py:251-277``), or kmeans clustering metrics.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from graph_transformer_tpu.cli.common import base_parser, config_from_args
from graph_transformer_tpu.data.citation import NODE_DATASETS, load_node_dataset
from graph_transformer_tpu.train.node_trainer import train_evaluate_node


def main(argv=None):
    parser = base_parser("TPU-native single-graph node classification")
    parser.add_argument(
        "--node_dataset", default="karate", help=f"one of {sorted(NODE_DATASETS)}"
    )
    parser.add_argument("--citation_dir", default=None,
                        help="directory with Planetoid ind.<name>.* files")
    parser.add_argument("--node_model", default="u2gnn",
                        choices=["u2gnn", "gcn", "gat"])
    parser.add_argument("--loss_type", default="default",
                        choices=["default", "gae", "contrastive"])
    parser.add_argument("--sampler_type", default="default",
                        choices=["default", "neighbor"])
    parser.add_argument("--eval_mode", default="masks",
                        choices=["masks", "2fold", "kmeans"])
    parser.add_argument("--save_embeddings", default=None, help=".npy path")
    args = parser.parse_args(argv)

    cfg = config_from_args(args)
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model,
            model=args.node_model,
            loss_type=args.loss_type,
            sampler_type=args.sampler_type,
        )
    )

    if args.node_dataset.startswith("npz:"):
        from graph_transformer_tpu.data.citation import load_npz

        ds = load_npz(args.node_dataset[4:])
    else:
        kw = {}
        if args.node_dataset in ("cora", "citeseer", "pubmed") and args.citation_dir:
            kw["data_dir"] = args.citation_dir
        ds = load_node_dataset(args.node_dataset, **kw)
    print(f"# node data: {ds.name}, {ds.num_nodes} nodes, "
          f"{ds.graph.num_directed_edges} directed edges, "
          f"{ds.num_classes} classes, feature dim {ds.feature_dim}")

    out = train_evaluate_node(ds, cfg, eval_mode=args.eval_mode)
    print(f"best {args.eval_mode} metric: {out['best_metric']:.4f}")

    if args.save_embeddings:
        emb = out["trainer"].node_embeddings()
        os.makedirs(os.path.dirname(os.path.abspath(args.save_embeddings)),
                    exist_ok=True)
        np.save(args.save_embeddings, emb)
        print(f"saved embeddings to {args.save_embeddings}")
    return out["best_metric"]


if __name__ == "__main__":
    main()
