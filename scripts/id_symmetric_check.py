"""Id-symmetric candidate sampler check (VERDICT r4 item 9, ROADMAP 8c).

The file-order leak (round-4 finding) flows through one channel: the
transductive unsup protocol trains one output-embedding row per global
node id, and the row's log-uniform negative-sampling pressure is a strong
function of its numeric id — which, in the class-sorted TU files, encodes
the label.  ``permute_graphs`` cuts the channel in the data pipeline;
``ModelConfig.id_symmetric`` cuts it INSIDE the loss: node v trains row
π(v) for a per-run random permutation π, and eval reads the rows back in
node order.  The learning problem is identical; only the id↔label
correlation in the candidate distribution is destroyed.

This runs the README unsup configs on PTC and IMDBBINARY with
``id_symmetric=True`` (file-ordered data, untouched pipeline) and compares
to the measured ``permuted`` rows in ``runs/unsup_leak_control.json``.
Equivalence bar: within fold noise (|Δ| ≤ 0.04).  If it matches, the
id-symmetric mode is the zero-cost default honest protocol.

Chip: ~4 min.  Writes runs/id_symmetric_check.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_transformer_tpu.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from graph_transformer_tpu.data.tu import load_tu_dataset
from graph_transformer_tpu.train.unsup_trainer import train_evaluate_unsup

OUT = "runs/id_symmetric_check.json"

# same rows as scripts/unsup_leak_control.py (README.md:49-51 configs)
CONFIGS = {
    "PTC": dict(batch=2, K=4, T=2, epochs=50),
    "IMDBBINARY": dict(batch=2, K=8, T=1, epochs=50),
}


def main():
    with open("runs/unsup_leak_control.json") as f:
        leak = json.load(f)
    prev = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            prev = json.load(f)
    fail = []
    for name, c in CONFIGS.items():
        if name in prev:
            continue
        ds = load_tu_dataset(name)  # FILE ORDER — the pipeline is untouched
        cfg = ExperimentConfig(
            data=DataConfig(batch_size=c["batch"], num_neighbors=c["K"]),
            model=ModelConfig(
                num_timesteps=c["T"], num_hidden_layers=1,
                ff_hidden_size=1024, sampled_num=512, id_symmetric=True,
            ),
            train=TrainConfig(num_epochs=c["epochs"], learning_rate=1e-4,
                              eval_every=2, scan_epochs=True),
        )
        t0 = time.time()
        r = train_evaluate_unsup(
            ds, cfg, log_fn=lambda m: print(f"[{name}] {m}", flush=True)
        )
        ref = leak[f"{name}/u2gnn/permuted"]
        row = {
            "id_symmetric": {"best_mean": r["best_mean"],
                             "best_std": r["best_std"]},
            "permuted_protocol": {"best_mean": ref["best_mean"],
                                  "best_std": ref["best_std"]},
            "abs_gap": abs(r["best_mean"] - ref["best_mean"]),
            "within_fold_noise": abs(r["best_mean"] - ref["best_mean"])
            <= 0.04,
            "config": c,
            "seconds": time.time() - t0,
        }
        prev[name] = row
        with open(OUT, "w") as f:
            json.dump(prev, f, indent=1)
        print(f"{name}: id-symmetric {r['best_mean']:.4f} vs permuted "
              f"{ref['best_mean']:.4f} (gap {row['abs_gap']:.4f})",
              flush=True)
    for name, row in prev.items():
        if not row["within_fold_noise"]:
            fail.append(name)
    if fail:
        print(f"ID-SYMMETRIC CHECK FAILED: {fail} exceed |gap| 0.04")
        sys.exit(1)
    print("id-symmetric check: PASS")


if __name__ == "__main__":
    main()
