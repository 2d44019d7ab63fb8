"""File-order leak control for the transductive unsupervised protocol
(round-4 finding).

**The finding.** TU dataset files list graphs sorted by class: the graph
*index alone* predicts the label at 0.99-1.00 10-fold accuracy on
PTC/IMDBBINARY/MUTAG.  The reference's unsupervised protocol
(``train_pytorch_U2GNN_UnSup.py``, ``gcn_baseline/train_unsup_gcn.py``)
trains one sampled-softmax output-embedding row per *global node id* and
pools them per graph for the logistic probe.  The log-uniform candidate
distribution P(k) = log(1+1/(k+1))/log(N+1) makes each row's negative-
sampling pressure a strong function of its numeric id, so pooled
embeddings encode file position — which is the label.  Measured on PTC
(gcn_unsup, ff 256, 10 epochs, CPU): original order probe 0.7475,
class-order-permuted 0.4908 — the "accuracy" is the leak.

**The control.** For each dataset × {gcn_unsup, u2gnn} at the README
configs, train twice — on the file-ordered dataset (reference parity) and
on a graph-permuted dataset (:func:`permute_graphs`, the leak-free
protocol) — and report both probes.  Leak-free numbers are the honest
capability measurement; file-order numbers reproduce what the
reference/paper protocol would report.

Writes runs/unsup_leak_control.json (row-level resume).  Chip: ~40 min.
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
from graph_transformer_tpu.data.tu import load_tu_dataset, permute_graphs
from graph_transformer_tpu.train.unsup_trainer import train_evaluate_unsup

OUT = "runs/unsup_leak_control.json"

# README unsup configs (README.md:49-51) — same rows as runs/unsup_all
CONFIGS = {
    "MUTAG": dict(batch=2, K=8, T=1, epochs=50),
    "PTC": dict(batch=2, K=4, T=2, epochs=50),
    "IMDBBINARY": dict(batch=2, K=8, T=1, epochs=50),
    # coverage extension (round-4 stage 7): same default unsup config the
    # RESULTS.md breadth rows used
    "PROTEINS": dict(batch=2, K=8, T=1, epochs=50),
    "IMDBMULTI": dict(batch=2, K=8, T=1, epochs=50),
}
MODELS = ("u2gnn", "gcn_unsup")


def run_one(ds, model, c):
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=c["batch"], num_neighbors=c["K"]),
        model=ModelConfig(
            model=model, num_timesteps=c["T"],
            num_hidden_layers=2 if model == "gcn_unsup" else 1,
            ff_hidden_size=1024, sampled_num=512,
        ),
        train=TrainConfig(num_epochs=c["epochs"], learning_rate=1e-4,
                          eval_every=2, scan_epochs=True),
    )
    t0 = time.time()
    r = train_evaluate_unsup(
        ds, cfg,
        log_fn=lambda m: print(f"[{model} {ds.name}] {m}", flush=True),
    )
    return {"best_mean": r["best_mean"], "best_std": r["best_std"],
            "seconds": time.time() - t0}


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--datasets", nargs="*", default=list(CONFIGS),
                    choices=list(CONFIGS))
    args = ap.parse_args()
    out = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            out = json.load(f)
    os.makedirs("runs", exist_ok=True)
    for name in args.datasets:
        c = CONFIGS[name]
        base = load_tu_dataset(name)
        for model in MODELS:
            for order, ds in (("file_order", base),
                              ("permuted", permute_graphs(base, seed=1))):
                key = f"{name}/{model}/{order}"
                if key in out:
                    print(f"{key}: already measured, skipping", flush=True)
                    continue
                out[key] = {**run_one(ds, model, c), "config": c}
                print(f"{key}: {out[key]['best_mean']:.4f}"
                      f"±{out[key]['best_std']:.4f}", flush=True)
                with open(OUT, "w") as f:
                    json.dump(out, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
