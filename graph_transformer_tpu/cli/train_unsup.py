"""Unsupervised U2GNN node-embedding CLI.

Command-line parity with ``train_pytorch_U2GNN_UnSup.py`` (README commands at
``README.md:49-51``): transductive training over all graphs, per-epoch 10-fold
logistic-regression evaluation of pooled embeddings, ``model_acc.txt`` output;
plus Orbax checkpoint/resume.
"""

from __future__ import annotations

import os
import time

import numpy as np

from graph_transformer_tpu.cli.common import base_parser, config_from_args
from graph_transformer_tpu.data.tu import load_tu_dataset
from graph_transformer_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from graph_transformer_tpu.train.unsup_trainer import UnsupTrainer


def main(argv=None):
    parser = base_parser("TPU-native U2GNN unsupervised node embeddings")
    parser.add_argument(
        "--sampled_softmax_mode", default="tf", choices=["tf", "reference"],
        help="'tf' = tf.nn.sampled_softmax_loss semantics; 'reference' = the "
             "PyTorch fork's NCE variant",
    )
    parser.add_argument(
        "--permute_graphs", type=int, default=None, metavar="SEED",
        help="leak-free protocol: shuffle the dataset's graph order with "
             "this seed before training.  The TU files are class-sorted, so "
             "the reference's transductive global-id protocol reads the "
             "label out of node-id statistics — measured on PTC the probe "
             "drops 0.75 -> 0.49 once the order is shuffled "
             "(scripts/unsup_leak_control.py).  Omit for file-order "
             "reference parity.",
    )
    parser.add_argument(
        "--id_symmetric", action="store_true", default=None,
        help="leak control inside the loss: train node v's output-embedding "
             "row at a per-run random permuted index, cutting the id->label "
             "channel with zero data-pipeline cost (matches the "
             "--permute_graphs numbers; runs/id_symmetric_check.json).  "
             "THE DEFAULT unless --reference_parity is given.",
    )
    parser.add_argument(
        "--reference_parity", action="store_true",
        help="reproduce the reference protocol EXACTLY, including its "
             "file-order leak: TU files are class-sorted and the "
             "transductive global-id protocol reads the label out of "
             "node-id statistics (measured: PTC probe 0.82 -> 0.58 on the "
             "reference's own torch implementation once the order is "
             "permuted, runs/torch_leak_repro.json).  Numbers produced "
             "under this flag measure the leak, not the representation.",
    )
    args = parser.parse_args(argv)
    import dataclasses as _dc

    # honest protocol by default: id-symmetric candidate indexing (verified
    # equivalent to --permute_graphs, zero pipeline cost).  Explicit
    # --reference_parity restores the reference's literal (leaky) protocol.
    if args.id_symmetric is None:
        args.id_symmetric = not args.reference_parity
    if args.reference_parity and (args.id_symmetric
                                  or args.permute_graphs is not None):
        parser.error("--reference_parity excludes --id_symmetric/"
                     "--permute_graphs")

    cfg = config_from_args(args)
    cfg = cfg.replace(
        model=_dc.replace(cfg.model,
                          sampled_softmax_mode=args.sampled_softmax_mode,
                          id_symmetric=args.id_symmetric)
    )
    model_name = args.model_name or f"{args.dataset}_unsup"
    out_dir = os.path.join(args.run_folder, model_name)
    os.makedirs(out_dir, exist_ok=True)
    acc_path = os.path.join(out_dir, "model_acc.txt")

    ds = load_tu_dataset(
        cfg.data.dataset, cfg.data.degree_as_tag, cfg.data.data_dir,
        use_node_attributes=cfg.data.use_node_attributes,
    )
    if args.permute_graphs is not None:
        from graph_transformer_tpu.data.tu import permute_graphs

        ds = permute_graphs(ds, seed=args.permute_graphs)
        print(f"# leak-free protocol: graph order permuted (seed "
              f"{args.permute_graphs})")
    proto = ("reference-parity (FILE-ORDER LEAK ACTIVE)"
             if args.reference_parity else
             "leak-free (id-symmetric candidate indexing)"
             if args.id_symmetric else "leak-free (permuted graph order)")
    print(f"# protocol: {proto}")
    print(f"# data: {ds.num_graphs} graphs, {ds.num_nodes} nodes (vocab), "
          f"{ds.num_classes} classes")
    trainer = UnsupTrainer(ds, cfg)

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

    best_mean, best_std = 0.0, 0.0
    for epoch in range(start_epoch, cfg.train.num_epochs + 1):
        t0 = time.time()
        loss = (
            trainer.train_epoch_stacked()
            if cfg.train.scan_epochs
            else trainer.train_epoch()
        )
        if epoch % cfg.train.eval_every == 0:
            mean, std = trainer.evaluate()
        else:
            mean, std = float("nan"), float("nan")
        if mean == mean and mean > best_mean:
            best_mean, best_std = mean, std
        dt = time.time() - t0
        print(f"epoch {epoch:03d} | loss {loss:12.2f} | "
              f"10-fold acc {mean:.5f} ± {std:.5f} | {dt:.2f}s")
        with open(acc_path, "a") as f:
            # reference line format (values ×100,
            # train_pytorch_U2GNN_UnSup.py:213)
            f.write(f"epoch {epoch} mean: {mean * 100} std: {std * 100}\n")
        if cfg.train.checkpoint_every and epoch % cfg.train.checkpoint_every == 0:
            save_checkpoint(
                ckpt_dir, epoch, trainer.params, trainer.opt_state,
                {"epoch": epoch, "losses": np.asarray(trainer.epoch_losses)},
            )
    print(f"best: {best_mean:.5f} ± {best_std:.5f}")
    return best_mean, best_std


if __name__ == "__main__":
    main()
