"""Measured in-environment reference accuracy anchor (VERDICT r3 item 5).

Runs REAL 10-fold supervised training of the reference's PyTorch U2GNN on
CPU at the README-family config, replacing the "recalled, not verifiable"
MUTAG anchor in RESULTS.md with a number measured in this container.

Faithful to ``train_pytorch_U2GNN_Sup.py``:
- sampling-with-replacement batch loader (``:121-126``), fanout-K
  neighborhoods with self at slot 0 (``:107-113``) — via the framework's
  format-exact ``BatchBuilder`` (same RNG family, same semantics);
- ``nn.TransformerEncoder(TransformerEncoderLayer(d_model=D, nhead=1,
  ff, dropout=0.5), T)`` (``pytorch_U2GNN_Sup.py:20-21``);
- soft-label CE with smoothing 0.1 (``:48-60,140-142``), grad-clip 0.5,
  Adam, plateau StepLR gamma=0.1 when ``loss[-1] > mean(loss[-6:-1])``
  (``train_utils.py:212-213``);
- StratifiedKFold(shuffle=True, random_state=0) splits (``util.py:160-173``)
  — the same splits the framework's CV runners use, so rows compare
  directly;
- per-epoch test-fold accuracy, best-epoch reported per fold.

Two attention-axis variants (SURVEY §3.1):
- ``node``: the PyTorch reference's ACTUAL computation — torch 1.5
  TransformerEncoder without batch_first treats [N, K+1, D] as (S, B, E),
  so attention runs across the node axis.  Tractable on MUTAG-size batches
  (it is O(N^2) and intractable at REDDIT scale).
- ``neigh``: the intended semantics (the TF implementation's, and this
  framework's default).

Writes runs/torch_reference_mutag.json incrementally (fold-level resume).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch

from graph_transformer_tpu.data.batching import BatchBuilder
from graph_transformer_tpu.data.splits import stratified_kfold_indices
from graph_transformer_tpu.data.tu import load_tu_dataset

OUT = "runs/torch_reference_mutag.json"


class RefU2GNNSup(torch.nn.Module):
    """pytorch_U2GNN_Sup.py:14-46 semantics, single U2GNN layer."""

    def __init__(self, d, c, ff, t, axis):
        super().__init__()
        layer = torch.nn.TransformerEncoderLayer(
            d_model=d, nhead=1, dim_feedforward=ff, dropout=0.5
        )
        self.enc = torch.nn.TransformerEncoder(layer, t)
        self.drop = torch.nn.Dropout(0.5)
        self.head = torch.nn.Linear(d, c)
        self.axis = axis

    def forward(self, input_x, pool, x_concat):
        input_tr = torch.nn.functional.embedding(input_x, x_concat)
        if self.axis == "node":
            # the reference's literal call: no transpose, so (S=N, B=K+1, E)
            # and split(dim=1)[0] keeps the self column
            # (pytorch_U2GNN_Sup.py:32-37)
            out = self.enc(input_tr)[:, 0, :]
        else:
            out = self.enc(input_tr.transpose(0, 1))[0]
        graph_emb = torch.spmm(pool, out)
        return self.head(self.drop(graph_emb))


def make_batch_tensors(b, batch_size):
    n_real = int(np.asarray(b.node_mask).sum())
    input_x = torch.from_numpy(np.asarray(b.neigh)[:n_real].astype(np.int64))
    x_concat = torch.from_numpy(np.asarray(b.x)[:n_real])
    gid = np.asarray(b.graph_id)[:n_real]
    idx = torch.from_numpy(np.stack([gid, np.arange(n_real)]).astype(np.int64))
    pool = torch.sparse_coo_tensor(
        idx, torch.ones(n_real), (batch_size, n_real)
    ).coalesce()
    labels = torch.from_numpy(np.asarray(b.labels).astype(np.int64))
    return input_x, pool, x_concat, labels


def run_fold(ds, tr_idx, te_idx, cfg, axis, seed, log):
    torch.manual_seed(seed)
    builder = BatchBuilder(ds, batch_size=cfg["batch"],
                           num_neighbors=cfg["K"], seed=seed, indices=tr_idx)
    te_builder = BatchBuilder(ds, batch_size=len(te_idx),
                              num_neighbors=cfg["K"], seed=seed + 1,
                              indices=te_idx)
    model = RefU2GNNSup(ds.feature_dim, ds.num_classes, cfg["ff"], cfg["T"],
                        axis)
    opt = torch.optim.Adam(model.parameters(), lr=cfg["lr"])
    steps = max(1, (len(tr_idx) + cfg["batch"] - 1) // cfg["batch"])
    # reference-exact: StepLR(step_size=batches_per_epoch), .step() called
    # once per plateau event (train_pytorch_U2GNN_Sup.py:146-147,
    # train_utils.py:212-213) — so a decay needs batches_per_epoch plateau
    # events and effectively never fires on small datasets.  step_size=1
    # here would collapse the LR within ~10 epochs and freeze the model.
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=steps, gamma=0.1)
    losses, best = [], 0.0
    for epoch in range(1, cfg["epochs"] + 1):
        model.train()
        total = 0.0
        for _ in range(steps):
            input_x, pool, x_concat, labels = make_batch_tensors(
                builder.sample(), cfg["batch"]
            )
            scores = model(input_x, pool, x_concat)
            c = scores.shape[1]
            smooth = torch.full((scores.shape[0], c), 0.1 / (c - 1))
            smooth.scatter_(1, labels[:, None], 0.9)
            loss = -(smooth * torch.log_softmax(scores, 1)).sum(1).mean()
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 0.5)
            opt.step()
            total += float(loss)
        losses.append(total)
        # plateau LR step (train_utils.py:212-213)
        if epoch > 5 and losses[-1] > float(np.mean(losses[-6:-1])):
            sched.step()
        model.eval()
        with torch.no_grad():
            b = te_builder.build(te_idx)
            input_x, pool, x_concat, labels = make_batch_tensors(
                b, len(te_idx)
            )
            pred = model(input_x, pool, x_concat).argmax(1)
            acc = float((pred == labels).float().mean())
        best = max(best, acc)
        if epoch % 10 == 0:
            log(f"  epoch {epoch:02d} loss {total:8.3f} acc {acc:.4f} "
                f"best {best:.4f}")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="MUTAG")
    ap.add_argument("--axis", choices=["neigh", "node", "both"],
                    default="both")
    ap.add_argument("--epochs", type=int, default=50)
    args = ap.parse_args()

    # README configs: MUTAG family (README.md:37) / PTC (README.md:39)
    per_ds = {"MUTAG": {"K": 8, "T": 4}, "PTC": {"K": 16, "T": 3}}
    cfg = {"batch": 4, "ff": 1024, "lr": 5e-4, "epochs": args.epochs,
           **per_ds.get(args.dataset, {"K": 8, "T": 4})}
    ds = load_tu_dataset(args.dataset)
    folds = stratified_kfold_indices(ds.labels, 10, seed=0)

    out = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            out = json.load(f)
    os.makedirs("runs", exist_ok=True)
    axes = ["neigh", "node"] if args.axis == "both" else [args.axis]
    for axis in axes:
        key = f"{args.dataset}/{axis}"
        rec = out.setdefault(key, {"config": cfg, "folds": []})
        for fi in range(len(rec["folds"]), 10):
            tr_idx, te_idx = folds[fi]
            t0 = time.time()
            best = run_fold(ds, tr_idx, te_idx, cfg, axis, seed=123 + fi,
                            log=lambda m: print(f"[{key} f{fi}] {m}",
                                                flush=True))
            rec["folds"].append(best)
            rec["mean"] = float(np.mean(rec["folds"]))
            rec["std"] = float(np.std(rec["folds"]))
            print(f"{key} fold {fi}: best {best:.4f} "
                  f"({time.time()-t0:.0f}s) running mean {rec['mean']:.4f}",
                  flush=True)
            with open(OUT, "w") as f:
                json.dump(out, f, indent=1)
    for k, v in out.items():
        if "mean" in v:
            print(f"{k}: {v['mean']:.4f} ± {v['std']:.4f} "
                  f"({len(v['folds'])} folds)")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
