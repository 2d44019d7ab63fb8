"""HPO CLI: tune U2GNN hyperparameters.

Two pipelines, mirroring the reference's two Ax notebooks:

- ``--pipeline unsup`` (default): unsupervised graph embeddings on a TU
  dataset (``find_best_hyperparams_for_dataset.ipynb`` cell 7: num_timesteps,
  sampled_num, num_hidden_layers, log-scale learning_rate; objective =
  10-fold logistic accuracy of the learned embeddings).
- ``--pipeline node``: single-graph node-embedding pipeline
  (``node_embedding_HPO.ipynb``): same space over the node trainer
  (``node_train_utils.py``); objective = the chosen node eval metric.
"""

from __future__ import annotations

import dataclasses
import json
import os

from graph_transformer_tpu.cli.common import base_parser, config_from_args
from graph_transformer_tpu.data.tu import load_tu_dataset
from graph_transformer_tpu.exp.hpo import best_arm, optimize
from graph_transformer_tpu.train.unsup_trainer import UnsupTrainer


def main(argv=None):
    parser = base_parser("HPO for U2GNN embeddings (unsup TU / node pipeline)")
    parser.add_argument("--total_trials", default=15, type=int)
    parser.add_argument("--trial_epochs", default=5, type=int,
                        help="epochs per HPO trial")
    parser.add_argument("--results_json", default=None)
    parser.add_argument("--pipeline", default="unsup", choices=["unsup", "node"])
    parser.add_argument("--node_dataset", default="cora",
                        help="node pipeline: dataset name (data/citation.py)")
    parser.add_argument("--node_model", default="u2gnn",
                        choices=["u2gnn", "gcn", "gat"])
    parser.add_argument("--node_eval", default="masks",
                        choices=["masks", "2fold"])
    args = parser.parse_args(argv)
    base_cfg = config_from_args(args)

    def trial_cfg(params):
        return base_cfg.replace(
            model=dataclasses.replace(
                base_cfg.model,
                num_timesteps=int(params["num_timesteps"]),
                num_hidden_layers=int(params["num_hidden_layers"]),
                sampled_num=int(params["sampled_num"]),
            ),
            train=dataclasses.replace(
                base_cfg.train,
                learning_rate=float(params["learning_rate"]),
                num_epochs=args.trial_epochs,
            ),
        )

    if args.pipeline == "node":
        from graph_transformer_tpu.data.citation import load_node_dataset
        from graph_transformer_tpu.train.node_trainer import NodeTrainer

        node_ds = load_node_dataset(args.node_dataset)
        base_cfg = base_cfg.replace(
            model=dataclasses.replace(base_cfg.model, model=args.node_model)
        )

        def evaluate(params):
            # vocab = node count on a single graph; clamp the candidate count
            params = dict(
                params,
                sampled_num=min(int(params["sampled_num"]), node_ds.num_nodes // 2),
            )
            trainer = NodeTrainer(node_ds, trial_cfg(params))
            best = 0.0
            for _ in range(args.trial_epochs):
                trainer.train_epoch()
                metric = (
                    trainer.evaluate_masks()
                    if args.node_eval == "masks"
                    else trainer.evaluate_2fold()
                )
                best = max(best, metric)
            return best

    else:
        ds = load_tu_dataset(
            base_cfg.data.dataset, base_cfg.data.degree_as_tag, base_cfg.data.data_dir
        )

        def evaluate(params):
            trainer = UnsupTrainer(ds, trial_cfg(params))
            best = 0.0
            for _ in range(args.trial_epochs):
                trainer.train_epoch()
                mean, _ = trainer.evaluate()
                best = max(best, mean)
            return best

    space = [
        {"name": "num_timesteps", "type": "range", "bounds": [1, 6]},
        {"name": "num_hidden_layers", "type": "range", "bounds": [1, 3]},
        {"name": "sampled_num", "type": "choice", "values": [128, 256, 512]},
        {"name": "learning_rate", "type": "range", "bounds": [1e-5, 1e-2],
         "log_scale": True},
    ]
    best_params, best_value, trials = optimize(
        space, evaluate, total_trials=args.total_trials,
        objective_name="accuracy", seed=base_cfg.train.seed,
    )
    print(f"best accuracy {best_value:.5f} with {best_params}")
    if args.results_json:
        os.makedirs(os.path.dirname(os.path.abspath(args.results_json)),
                    exist_ok=True)
        with open(args.results_json, "w") as f:
            json.dump({"best": best_arm(trials, "accuracy"),
                       "trials": trials}, f, indent=2)
    return best_params, best_value


if __name__ == "__main__":
    main()
