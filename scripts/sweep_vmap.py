"""Config sweep with full 10-fold CV per config, fold-vmapped on one chip.

Supersedes the staged screen in sweep_ptc.py: with TenfoldVmapRunner a FULL
10-fold (the number the paper tables report) costs about what one fold used
to, so every candidate gets the real metric — no screening noise.

Grids follow the U2GNN paper's stated search ranges (T in 1..6,
K in {4,8,16}, k in {1,2,3}; arXiv:1909.11855) around the reference README
configs (`README.md:37-39`).  Appends one JSON line per config to --out
(resumable), prints a ranking at the end.
"""

from __future__ import annotations

import argparse
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
from graph_transformer_tpu.data.tu import load_tu_dataset
from graph_transformer_tpu.train.tenfold_vmap import TenfoldVmapRunner

GRIDS = {
    # base: bs 4, K=16, T=3, ff 1024, lr 5e-4, k=1 (README.md:39)
    "PTC": {
        "readme_base": {},
        "K4_T2": {"num_neighbors": 4, "num_timesteps": 2},
        "K8_T2": {"num_neighbors": 8, "num_timesteps": 2},
        "K8_T4": {"num_neighbors": 8, "num_timesteps": 4},
        "K16_T1": {"num_neighbors": 16, "num_timesteps": 1},
        "K16_T6": {"num_neighbors": 16, "num_timesteps": 6},
        "k2_K8_T4": {"num_hidden_layers": 2, "num_neighbors": 8,
                     "num_timesteps": 4},
        "k2_K16_T3": {"num_hidden_layers": 2},
        "k3_K4_T2": {"num_hidden_layers": 3, "num_neighbors": 4,
                     "num_timesteps": 2},
        "k3_K16_T3": {"num_hidden_layers": 3},
        "lr1e-4": {"learning_rate": 1e-4},
        "lr1e-3": {"learning_rate": 1e-3},
        "drop0": {"dropout": 0.0},
        "ff128_K8_T4": {"ff_hidden_size": 128, "num_neighbors": 8,
                        "num_timesteps": 4},
        "bs16": {"batch_size": 16},
        "deg_tag": {"degree_as_tag": True},
    },
    # refinement around the strong T=1 signal (K16_T1 screened 0.645)
    "PTC_T1": {
        "K16_T1": {"num_neighbors": 16, "num_timesteps": 1},
        "K8_T1": {"num_neighbors": 8, "num_timesteps": 1},
        "K4_T1": {"num_neighbors": 4, "num_timesteps": 1},
        "k2_K16_T1": {"num_hidden_layers": 2, "num_neighbors": 16,
                      "num_timesteps": 1},
        "k3_K16_T1": {"num_hidden_layers": 3, "num_neighbors": 16,
                      "num_timesteps": 1},
        "K16_T1_lr1e-3": {"num_neighbors": 16, "num_timesteps": 1,
                          "learning_rate": 1e-3},
        "K16_T1_lr1e-4": {"num_neighbors": 16, "num_timesteps": 1,
                          "learning_rate": 1e-4},
        "K16_T1_drop0": {"num_neighbors": 16, "num_timesteps": 1,
                         "dropout": 0.0},
        "K16_T1_ff128": {"num_neighbors": 16, "num_timesteps": 1,
                         "ff_hidden_size": 128},
        "K16_T1_deg": {"num_neighbors": 16, "num_timesteps": 1,
                       "degree_as_tag": True},
        "K16_T1_100ep": {"num_neighbors": 16, "num_timesteps": 1,
                         "num_epochs": 100},
        # combinations of the phase-1 winners (T=1, degree_as_tag, ff 128)
        "K16_T1_deg_ff128": {"num_neighbors": 16, "num_timesteps": 1,
                             "degree_as_tag": True, "ff_hidden_size": 128},
        "K8_T1_deg": {"num_neighbors": 8, "num_timesteps": 1,
                      "degree_as_tag": True},
        "K16_T1_deg_lr1e-4": {"num_neighbors": 16, "num_timesteps": 1,
                              "degree_as_tag": True, "learning_rate": 1e-4},
        "K16_T2_deg": {"num_neighbors": 16, "num_timesteps": 2,
                       "degree_as_tag": True},
    },
    # base: bs 4, K=8, T=4, ff 1024, lr 5e-4 (README.md:37)
    "IMDBBINARY": {
        "readme_base": {},
        "K8_T1": {"num_timesteps": 1},
        "K8_T2": {"num_timesteps": 2},
        "K16_T4": {"num_neighbors": 16},
        "K16_T1": {"num_neighbors": 16, "num_timesteps": 1},
        "K4_T4": {"num_neighbors": 4},
        "k2_K8_T4": {"num_hidden_layers": 2},
        "lr1e-4": {"learning_rate": 1e-4},
        "ff128": {"ff_hidden_size": 128},
    },
    # base: bs 4, K=8, T=4 (IMDBBINARY-shaped, README.md:37).  The paper's
    # stated search space is T in 1..6, K in {4,8,16}, k in {1,2,3}
    # (arXiv:1909.11855 sec 4.2); shallow-T and degree_as_tag won on PTC, so
    # those combos are included here too.
    "MUTAG": {
        "readme_base": {},
        "K16_T3": {"num_neighbors": 16, "num_timesteps": 3},
        "K16_T6": {"num_neighbors": 16, "num_timesteps": 6},
        "K4_T2": {"num_neighbors": 4, "num_timesteps": 2},
        "K4_T1": {"num_neighbors": 4, "num_timesteps": 1},
        "K8_T1": {"num_timesteps": 1},
        "K16_T1": {"num_neighbors": 16, "num_timesteps": 1},
        "k2_K8_T4": {"num_hidden_layers": 2},
        "k3_K8_T4": {"num_hidden_layers": 3},
        "k2_K16_T3": {"num_hidden_layers": 2, "num_neighbors": 16,
                      "num_timesteps": 3},
        "lr1e-3": {"learning_rate": 1e-3},
        "lr1e-4": {"learning_rate": 1e-4},
        "drop0": {"dropout": 0.0},
        "bs16": {"batch_size": 16},
        "ff128": {"ff_hidden_size": 128},
        "deg_tag": {"degree_as_tag": True},
        "K8_T1_deg": {"num_timesteps": 1, "degree_as_tag": True},
        "100ep": {"num_epochs": 100},
    },
    # ---- round-2 re-sweeps: the round-1 grids trained under the broken
    # plateau decay (LR collapsed after ~6 epochs; ADVICE.md item 1), so
    # their rankings are invalid.  These compact grids re-test the r1
    # winners + the key axes under the fixed schedule.
    "PTC_r2": {
        "K16_T1": {"num_neighbors": 16, "num_timesteps": 1},
        "K16_T1_deg": {"num_neighbors": 16, "num_timesteps": 1,
                       "degree_as_tag": True},
        "ff128_K8_T4": {"ff_hidden_size": 128, "num_neighbors": 8,
                        "num_timesteps": 4},
        "K16_T1_ff128": {"num_neighbors": 16, "num_timesteps": 1,
                         "ff_hidden_size": 128},
        "deg_K16_T3": {"degree_as_tag": True},
    },
    # round-3 PTC close-the-gap grid (VERDICT item 5: paper anchor
    # 0.6963 ± 0.0360; round-2 best K16_T1_deg 0.6600 ± 0.0512): LR shapes,
    # post-pool dropout grid, longer schedules, batch/ff around the winner
    "PTC_r3": {
        "deg_lr1e-3": {"num_neighbors": 16, "num_timesteps": 1,
                       "degree_as_tag": True, "learning_rate": 1e-3},
        "deg_lr25e-5": {"num_neighbors": 16, "num_timesteps": 1,
                        "degree_as_tag": True, "learning_rate": 2.5e-4},
        "deg_drop0": {"num_neighbors": 16, "num_timesteps": 1,
                      "degree_as_tag": True, "dropout": 0.0},
        "deg_drop075": {"num_neighbors": 16, "num_timesteps": 1,
                        "degree_as_tag": True, "dropout": 0.75},
        "deg_100ep": {"num_neighbors": 16, "num_timesteps": 1,
                      "degree_as_tag": True, "num_epochs": 100},
        "deg_bs2": {"num_neighbors": 16, "num_timesteps": 1,
                    "degree_as_tag": True, "batch_size": 2},
        "deg_bs8": {"num_neighbors": 16, "num_timesteps": 1,
                    "degree_as_tag": True, "batch_size": 8},
        "deg_ff512": {"num_neighbors": 16, "num_timesteps": 1,
                      "degree_as_tag": True, "ff_hidden_size": 512},
        "deg_ls0": {"num_neighbors": 16, "num_timesteps": 1,
                    "degree_as_tag": True, "label_smoothing": 0.0},
        "deg_K8_T1": {"num_neighbors": 8, "num_timesteps": 1,
                      "degree_as_tag": True},
        "deg_K16_T2": {"num_neighbors": 16, "num_timesteps": 2,
                       "degree_as_tag": True},
        "deg_tied_T3": {"num_neighbors": 16, "num_timesteps": 3,
                        "degree_as_tag": True,
                        "share_timestep_weights": True},
    },
    # close-the-gap probes for PROTEINS (matrix base 0.7376 vs paper ≈0.785)
    "PROTEINS_r2": {
        "deg_tag": {"degree_as_tag": True},
        "K8_T1": {"num_timesteps": 1},
    },
    "MUTAG_r2": {
        "deg_K8_T4": {"degree_as_tag": True},
        "deg_K8_T2": {"degree_as_tag": True, "num_timesteps": 2},
        "deg_K16_T3": {"degree_as_tag": True, "num_neighbors": 16,
                       "num_timesteps": 3},
        "deg_bs16": {"degree_as_tag": True, "batch_size": 16},
        "deg_lr1e-3": {"degree_as_tag": True, "learning_rate": 1e-3},
        "deg_100ep": {"degree_as_tag": True, "num_epochs": 100},
        "deg_k2": {"degree_as_tag": True, "num_hidden_layers": 2},
    },
    # refinement around the MUTAG degree_as_tag winner (0.8769 vs 0.7757 base)
    "MUTAG_deg": {
        "deg_K8_T4": {"degree_as_tag": True},
        "deg_K16_T3": {"degree_as_tag": True, "num_neighbors": 16,
                       "num_timesteps": 3},
        "deg_K16_T6": {"degree_as_tag": True, "num_neighbors": 16,
                       "num_timesteps": 6},
        "deg_K4_T2": {"degree_as_tag": True, "num_neighbors": 4,
                      "num_timesteps": 2},
        "deg_K8_T2": {"degree_as_tag": True, "num_timesteps": 2},
        "deg_k2": {"degree_as_tag": True, "num_hidden_layers": 2},
        "deg_lr1e-3": {"degree_as_tag": True, "learning_rate": 1e-3},
        "deg_bs16": {"degree_as_tag": True, "batch_size": 16},
        "deg_ff128": {"degree_as_tag": True, "ff_hidden_size": 128},
        "deg_100ep": {"degree_as_tag": True, "num_epochs": 100},
    },
}

BASE = {
    "PTC": {"num_neighbors": 16, "num_timesteps": 3},
    "PTC_T1": {"num_neighbors": 16, "num_timesteps": 3},
    "MUTAG": {"num_neighbors": 8, "num_timesteps": 4},
    "IMDBBINARY": {"num_neighbors": 8, "num_timesteps": 4},
}

# grid key -> TU dataset (grids may be refinement phases of one dataset)
DATASET_OF = {
    "PTC_T1": "PTC",
    "PTC_r3": "PTC",
    "MUTAG_deg": "MUTAG",
    "PTC_r2": "PTC",
    "MUTAG_r2": "MUTAG",
    "PROTEINS_r2": "PROTEINS",
}


def make_cfg(dataset: str, over: dict) -> ExperimentConfig:
    base = dict(BASE.get(dataset, {"num_neighbors": 8, "num_timesteps": 4}))
    base.update(over)
    o = base
    return ExperimentConfig(
        data=DataConfig(
            dataset=dataset,
            batch_size=int(o.get("batch_size", 4)),
            num_neighbors=int(o.get("num_neighbors", 8)),
            degree_as_tag=o.get("degree_as_tag"),
        ),
        model=ModelConfig(
            num_timesteps=int(o.get("num_timesteps", 4)),
            num_hidden_layers=int(o.get("num_hidden_layers", 1)),
            ff_hidden_size=int(o.get("ff_hidden_size", 1024)),
            dropout=float(o.get("dropout", 0.5)),
            label_smoothing=float(o.get("label_smoothing", 0.1)),
            share_timestep_weights=bool(
                o.get("share_timestep_weights", False)
            ),
        ),
        train=TrainConfig(
            learning_rate=float(o.get("learning_rate", 5e-4)),
            num_epochs=int(o.get("num_epochs", 50)),
        ),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="PTC", choices=sorted(GRIDS),
                    help="grid name (maps to a TU dataset via DATASET_OF)")
    ap.add_argument("--out", default=None)
    ap.add_argument("--budget_s", default=10**9, type=float)
    ap.add_argument("--runner", default="vmap", choices=["vmap", "ondevice"],
                    help="'ondevice' = whole CV as one dispatch "
                    "(train/cv_ondevice.py; fastest)")
    args = ap.parse_args()
    out = args.out or f"runs/sweep_vmap/{args.dataset}.jsonl"
    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    t0 = time.time()

    done = {}
    if os.path.exists(out):
        with open(out) as f:
            for line in f:
                r = json.loads(line)
                done[r["name"]] = r

    grid = GRIDS[args.dataset]
    for name, over in grid.items():
        if name in done:
            print(f"skip {name} (done: {done[name]['mean']})", flush=True)
            continue
        if time.time() - t0 > args.budget_s:
            print("budget reached", flush=True)
            break
        cfg = make_cfg(DATASET_OF.get(args.dataset, args.dataset), over)
        ds = load_tu_dataset(
            cfg.data.dataset, cfg.data.degree_as_tag, cfg.data.data_dir
        )
        t1 = time.time()
        if args.runner == "ondevice":
            from graph_transformer_tpu.train.cv_ondevice import run_cv_on_device

            accs, mean, std = run_cv_on_device(ds, cfg)
        else:
            accs, mean, std = TenfoldVmapRunner(ds, cfg).run(log_fn=None)
        rec = {
            "name": name,
            "dataset": args.dataset,
            "mean": round(mean, 4),
            "std": round(std, 4),
            "accs": [round(float(a), 4) for a in accs],
            "config": over,
            "wall_s": round(time.time() - t1, 1),
        }
        done[name] = rec
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[{time.time()-t0:6.0f}s] {name}: {mean:.4f} ± {std:.4f} "
              f"({rec['wall_s']}s)", flush=True)

    print("ranking:", flush=True)
    for name, r in sorted(done.items(), key=lambda kv: -kv[1]["mean"]):
        print(f"  {name}: {r['mean']:.4f} ± {r['std']:.4f}", flush=True)


if __name__ == "__main__":
    main()
