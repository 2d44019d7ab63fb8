"""Shared CLI argument surface.

Matches the reference trainers' argparse flags
(``train_pytorch_U2GNN_Sup.py:24-39``, ``train_pytorch_U2GNN_UnSup.py``) so
README-style commands port verbatim, plus new flags for the TPU-native
capabilities (sharding, checkpointing, compute dtype).
"""

from __future__ import annotations

import argparse

from graph_transformer_tpu.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    ParallelConfig,
    TrainConfig,
)


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description=description,
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    # --- reference-compatible surface (train_pytorch_U2GNN_Sup.py:24-39)
    p.add_argument("--run_folder", default="runs", help="output root")
    p.add_argument("--dataset", default="PTC", help="TU dataset name")
    p.add_argument("--learning_rate", default=0.0005, type=float)
    p.add_argument("--batch_size", default=4, type=int)
    p.add_argument("--num_epochs", default=50, type=int)
    p.add_argument("--model_name", default=None, help="run name (default: auto)")
    p.add_argument("--sampled_num", "--num_sampled", dest="sampled_num",
                   default=512, type=int)
    p.add_argument("--dropout", default=0.5, type=float)
    p.add_argument("--num_hidden_layers", default=1, type=int)
    p.add_argument("--num_timesteps", default=1, type=int,
                   help="T: self-attention layers per U2GNN layer")
    p.add_argument("--ff_hidden_size", default=1024, type=int)
    p.add_argument("--num_neighbors", default=4, type=int)
    p.add_argument("--fold_idx", default=0, type=int, help="0-9")
    p.add_argument("--degree_as_tag", action="store_true")
    p.add_argument("--use_node_attributes", action="store_true",
                   help="use <dataset>_node_attributes.txt sidecar features")
    # --- new capabilities
    p.add_argument("--data_dir", default=None, help="TU dataset root")
    p.add_argument("--seed", default=123, type=int)
    p.add_argument("--attention_axis", default="neighborhood",
                   choices=["neighborhood", "node"],
                   help="'node' reproduces the PyTorch reference's axis quirk")
    p.add_argument("--share_timestep_weights", action="store_true",
                   help="Universal-Transformer weight tying across timesteps")
    p.add_argument("--recurrence", default="basic",
                   choices=["basic", "skip", "highway", "gru", "lstm", "dwa", "act"],
                   help="UT transition function between timesteps "
                        "(non-basic implies weight tying)")
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--use_pallas", action="store_true",
                   help="fused Pallas encoder-layer kernel (TPU; ~2.4x the "
                        "XLA path on REDDIT-scale batches)")
    p.add_argument("--whole_encoder", action="store_true",
                   help="whole-encoder hybrid kernel: mega-forward (all T "
                        "layers + slot-0 in one pallas_call) + per-layer "
                        "backward chain — another ~10%% over --use_pallas")
    p.add_argument("--scan_epochs", action="store_true",
                   help="train each epoch as one device dispatch "
                        "(pre-built stacked batches + lax.scan)")
    p.add_argument("--host_sampling", action="store_true",
                   help="sample neighborhoods on host instead of on device")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--checkpoint_every", default=0, type=int,
                   help="epochs between checkpoints (0 = off)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in checkpoint_dir")
    p.add_argument("--eval_every", default=1, type=int)
    return p


def config_from_args(args: argparse.Namespace) -> ExperimentConfig:
    return ExperimentConfig(
        data=DataConfig(
            dataset=args.dataset,
            data_dir=args.data_dir,
            degree_as_tag=args.degree_as_tag or None,
            use_node_attributes=getattr(args, "use_node_attributes", False),
            fold_idx=args.fold_idx,
            batch_size=args.batch_size,
            num_neighbors=args.num_neighbors,
            seed=args.seed,
        ),
        model=ModelConfig(
            ff_hidden_size=args.ff_hidden_size,
            num_timesteps=args.num_timesteps,
            num_hidden_layers=args.num_hidden_layers,
            dropout=args.dropout,
            sampled_num=args.sampled_num,
            attention_axis=args.attention_axis,
            share_timestep_weights=args.share_timestep_weights,
            recurrence=args.recurrence,
            compute_dtype=args.compute_dtype,
            use_pallas=args.use_pallas,
            use_pallas_whole_encoder=getattr(args, "whole_encoder", False),
        ),
        train=TrainConfig(
            learning_rate=args.learning_rate,
            num_epochs=args.num_epochs,
            eval_every=args.eval_every,
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every,
            seed=args.seed,
            on_device_sampling=not args.host_sampling,
            scan_epochs=args.scan_epochs,
        ),
        parallel=ParallelConfig(),
    )
