"""10-fold cross-validation runner.

The reference reports 10-fold accuracy but each script run covers one fold
(``--fold_idx``); this runner loops all folds and prints mean ± std — the
number the U2GNN paper tables report.
"""

from __future__ import annotations

import numpy as np

from graph_transformer_tpu.cli.common import base_parser, config_from_args
from graph_transformer_tpu.data.splits import stratified_kfold_indices
from graph_transformer_tpu.data.tu import load_tu_dataset
from graph_transformer_tpu.train.sup_trainer import SupTrainer


def main(argv=None):
    parser = base_parser("10-fold CV supervised U2GNN")
    parser.add_argument(
        "--vmap_folds",
        action="store_true",
        help="train all 10 folds simultaneously as one vmapped device "
        "program per epoch (~10x wall-clock on one chip; the reference "
        "batch sizes leave the MXU idle, so folds are nearly free)",
    )
    parser.add_argument(
        "--shard_folds",
        default=0,
        type=int,
        help="with --vmap_folds: shard the fold axis over this many devices "
        "(embarrassingly parallel over ICI; must divide 10)",
    )
    parser.add_argument(
        "--cv_on_device",
        action="store_true",
        help="run the ENTIRE 10-fold CV as one device dispatch: on-device "
        "graph selection + batch gather + fanout sampling, folds vmapped, "
        "epochs and steps scanned, eval and plateau-LR in-program "
        "(train/cv_ondevice.py). Fastest path; RNG differs from the "
        "host-sampled runners (statistically equivalent protocol).",
    )
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    ds = load_tu_dataset(cfg.data.dataset, cfg.data.degree_as_tag,
                         cfg.data.data_dir,
                         use_node_attributes=cfg.data.use_node_attributes)
    if args.cv_on_device:
        from graph_transformer_tpu.train.cv_ondevice import run_cv_on_device

        accs, mean, std = run_cv_on_device(ds, cfg)
        for i, a in enumerate(accs):
            print(f"fold {i}: best acc {a:.4f}")
        print(f"10-fold accuracy: {mean:.4f} ± {std:.4f}")
        return mean, std
    if args.vmap_folds:
        import jax

        from graph_transformer_tpu.train.tenfold_vmap import TenfoldVmapRunner

        mesh = None
        if args.shard_folds > 1:
            mesh = jax.sharding.Mesh(
                np.array(jax.devices()[: args.shard_folds]), ("data",)
            )
        runner = TenfoldVmapRunner(ds, cfg, mesh=mesh)
        accs, mean, std = runner.run()
        for i, a in enumerate(accs):
            print(f"fold {i}: best acc {a:.4f}")
        print(f"10-fold accuracy: {mean:.4f} ± {std:.4f}")
        return mean, std
    folds = stratified_kfold_indices(ds.labels, 10, seed=0)
    accs = []
    for i, (tr, te) in enumerate(folds):
        trainer = SupTrainer(ds, cfg, train_idx=tr, test_idx=te)
        best = 0.0
        step = (
            trainer.train_epoch_stacked
            if cfg.train.scan_epochs
            else trainer.train_epoch
        )
        for _ in range(cfg.train.num_epochs):
            step()
            best = max(best, trainer.evaluate())
        accs.append(best)
        print(f"fold {i}: best acc {best:.4f}")
    mean, std = float(np.mean(accs)), float(np.std(accs))
    print(f"10-fold accuracy: {mean:.4f} ± {std:.4f}")
    return mean, std


if __name__ == "__main__":
    main()
