"""Supervised U2GNN graph classification CLI.

Command-line parity with the reference's standalone driver
(``train_pytorch_U2GNN_Sup.py``; README commands at ``README.md:37-39`` run
verbatim modulo the module name):

    python -m graph_transformer_tpu.cli.train_sup --dataset IMDBBINARY \
        --batch_size 4 --ff_hidden_size 1024 --fold_idx 1 --num_neighbors 8 \
        --num_epochs 50 --num_timesteps 4 --learning_rate 0.0005

Writes per-epoch accuracy lines to ``<run_folder>/<model_name>/model_acc.txt``
(the reference's only persisted artifact, ``train_pytorch_U2GNN_Sup.py:198``)
and — a new capability — periodic Orbax checkpoints with ``--resume``.
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

from graph_transformer_tpu.cli.common import base_parser, config_from_args
from graph_transformer_tpu.data.tu import load_tu_dataset
from graph_transformer_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from graph_transformer_tpu.train.sup_trainer import SupTrainer


def main(argv=None):
    args = base_parser("TPU-native U2GNN supervised graph classification").parse_args(argv)
    cfg = config_from_args(args)
    model_name = args.model_name or f"{args.dataset}_sup_fold{args.fold_idx}"
    out_dir = os.path.join(args.run_folder, model_name)
    os.makedirs(out_dir, exist_ok=True)
    acc_path = os.path.join(out_dir, "model_acc.txt")

    ds = load_tu_dataset(
        cfg.data.dataset, cfg.data.degree_as_tag, cfg.data.data_dir,
        use_node_attributes=cfg.data.use_node_attributes,
    )
    print(f"# data: {ds.num_graphs} graphs, {ds.num_nodes} nodes, "
          f"{ds.num_classes} classes, feature dim {ds.feature_dim}")
    trainer = SupTrainer(ds, cfg)

    start_epoch = 1
    ckpt_dir = cfg.train.checkpoint_dir or os.path.join(out_dir, "checkpoints")
    if args.resume:
        path = latest_checkpoint(ckpt_dir)
        if path:
            trainer.params, trainer.opt_state, extra = restore_checkpoint(
                path, trainer.params, trainer.opt_state
            )
            if extra:
                start_epoch = int(extra.get("epoch", 0)) + 1
                trainer.epoch_losses = list(extra.get("losses", []))
                # rebuild the plateau-step count from the loss history so
                # the StepLR gating continues where it left off
                for i in range(len(trainer.epoch_losses)):
                    trainer.lr_scale = trainer.sched.update(
                        trainer.epoch_losses[: i + 1]
                    )
            print(f"# resumed from {path} at epoch {start_epoch}")

    best_acc = 0.0
    for epoch in range(start_epoch, cfg.train.num_epochs + 1):
        t0 = time.time()
        loss = trainer.train_epoch()
        acc = trainer.evaluate() if epoch % cfg.train.eval_every == 0 else float("nan")
        best_acc = max(best_acc, acc if acc == acc else 0.0)
        dt = time.time() - t0
        line = f"epoch {epoch:03d} | loss {loss:10.2f} | test acc {acc:.5f} | {dt:.2f}s"
        print(line)
        with open(acc_path, "a") as f:
            # reference line format (values ×100,
            # train_pytorch_U2GNN_Sup.py:212)
            f.write(
                f"epoch {epoch} fold {args.fold_idx} acc {acc * 100}%\n"
            )
        if cfg.train.checkpoint_every and epoch % cfg.train.checkpoint_every == 0:
            save_checkpoint(
                ckpt_dir, epoch, trainer.params, trainer.opt_state,
                {"epoch": epoch, "losses": np.asarray(trainer.epoch_losses)},
            )
    print(f"best test accuracy: {best_acc:.5f}")
    return best_acc


if __name__ == "__main__":
    main()
