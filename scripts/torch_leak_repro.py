"""File-order leak reproduced on the REFERENCE'S OWN math (VERDICT r4
item 2).

Round 4 established that the TU files are class-sorted and that the
reference's transductive unsupervised protocol — one sampled-softmax
output-embedding row per *global node id*, pooled per graph and read by a
logistic probe — scores the file position, which is the label.  Every
measurement so far ran on THIS framework's models; this script closes the
"your reimplementation differs" objection by training the reference's
literal unsup math in torch on CPU:

- ``TransformerEncoder(TransformerEncoderLayer(d_model=D, nhead=1,
  dim_feedforward=ff, dropout=0.5), T)`` over [self + K sampled
  neighbors] neighborhoods (``pytorch_U2GNN_UnSup.py:40-41,57-63``;
  neighborhood-axis — the intended semantics, tractable on CPU);
- the sampled-softmax loss EXACTLY as ``sampled_softmax.py:36-56``:
  gather true rows by global node id, gather candidate rows by
  log-uniform-sampled ids, ``logits = -log(exp(<in,true>) /
  sum(exp(in @ sampled^T)))`` — note: no expected-count correction, the
  reference discards ``true_freq``/``sample_freq``;
- output-embedding ``weight [vocab=N_nodes, D]`` init U(±sqrt(6/(N+D)))
  (``sampled_softmax.py:22-27``);
- LogUniformSampler semantics: unique accumulation from
  P(k) = log(1 + 1/(k+1)) / log(N+1) (``log_uniform/log_uniform.cpp``,
  the rdspring1/PyTorch_GBW_LM sampler);
- batch loader: ``batch_size`` random graphs, their nodes' [self + K
  with-replacement neighbors] (``train_pytorch_U2GNN_UnSup.py:107-136``);
- Adam(lr), grad-clip 0.5, plateau StepLR gamma=0.1
  (``train_pytorch_U2GNN_UnSup.py:145-148,204-205``);
- eval: ``graph_pool @ ss.weight`` sum-pooling + LogisticRegression
  (liblinear, tol=0.001) on StratifiedKFold(shuffle, seed 0) 10-fold,
  best epoch reported (``train_pytorch_U2GNN_UnSup.py:164-188``).

Trains twice: on the file-ordered dataset (what the reference/paper
protocol reports) and on a graph-permuted dataset (`permute_graphs` — the
honest protocol; the learning problem is identical, only the id<->label
correlation is cut).  A collapse ordered->permuted on the reference's own
math is the leak, measured implementation-independently.

CPU-only, minutes.  Writes runs/torch_leak_repro.json.
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

from graph_transformer_tpu.data.splits import stratified_kfold_indices
from graph_transformer_tpu.data.tu import load_tu_dataset, permute_graphs

OUT = "runs/torch_leak_repro.json"


def log_uniform_unique(vocab: int, nsampled: int, rng: np.random.Generator):
    """Unique log-uniform candidate ids — LogUniformSampler.sample
    semantics (accumulate distinct draws from
    P(k) = log(1+1/(k+1))/log(N+1) until nsampled)."""
    out: set[int] = set()
    while len(out) < nsampled:
        n = max(nsampled - len(out), 16)
        u = rng.random(2 * n)
        ids = np.exp(u * np.log(vocab + 1.0)).astype(np.int64) - 1
        ids = np.clip(ids, 0, vocab - 1)
        out.update(int(i) for i in ids)
        # cap: set can overshoot; trim after loop
    return np.fromiter(list(out)[:nsampled], np.int64, nsampled)


class RefU2GNNUnsup(torch.nn.Module):
    """pytorch_U2GNN_UnSup.py:36-63 + sampled_softmax.py:11-56, 1 U2GNN
    layer (the reference default), neighborhood-axis encoder."""

    def __init__(self, d, ff, t, vocab):
        super().__init__()
        layer = torch.nn.TransformerEncoderLayer(
            d_model=d, nhead=1, dim_feedforward=ff, dropout=0.5
        )
        self.enc = torch.nn.TransformerEncoder(layer, t)
        self.weight = torch.nn.Parameter(torch.empty(vocab, d))
        stdv = float(np.sqrt(6.0 / (vocab + d)))
        torch.nn.init.uniform_(self.weight, -stdv, stdv)

    def forward(self, x_concat, input_x, input_y, sample_ids):
        input_tr = torch.nn.functional.embedding(input_x, x_concat)
        # (K+1, B, D): attention across the neighborhood axis
        out = self.enc(input_tr.transpose(0, 1))[0]  # self row
        true_w = self.weight[input_y]
        samp_w = self.weight[sample_ids]
        true_logits = torch.exp(torch.sum(out * true_w, dim=1))
        sample_logits = torch.exp(out @ samp_w.t())
        # sampled_softmax.py:55 — no expected-count correction
        return -torch.log(true_logits / torch.sum(sample_logits, dim=1))


def train_probe(ds, *, epochs, batch, k, t, ff, lr, nsampled, seed,
                log_fn=print):
    torch.manual_seed(seed)
    rng = np.random.default_rng(seed)
    n_nodes = ds.num_nodes
    x_concat = torch.from_numpy(ds.node_feat.astype(np.float32))
    model = RefU2GNNUnsup(ds.feature_dim, ff, t, n_nodes)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    nb = (ds.num_graphs - 1) // batch + 1
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=nb, gamma=0.1)
    folds = stratified_kfold_indices(ds.labels, 10, seed=0)
    gid = ds.graph_of_node

    def probe():
        from sklearn.linear_model import LogisticRegression

        with torch.no_grad():
            node_emb = model.weight.numpy()
        gemb = np.zeros((ds.num_graphs, node_emb.shape[1]), np.float64)
        np.add.at(gemb, gid, node_emb)  # sum pooling == graph_pool spmm
        accs = []
        for tr, te in folds:
            cls = LogisticRegression(solver="liblinear", tol=0.001)
            cls.fit(gemb[tr], ds.labels[tr])
            accs.append(cls.score(gemb[te], ds.labels[te]))
        return float(np.mean(accs)), float(np.std(accs))

    best = probe()  # epoch-0 (init) control
    init_acc = best[0]
    cost = []
    for ep in range(1, epochs + 1):
        model.train()
        tot = 0.0
        for _ in range(nb):
            gsel = rng.permutation(ds.num_graphs)[:batch]
            nodes = np.concatenate(
                [np.arange(ds.graph_offsets[g], ds.graph_offsets[g + 1])
                 for g in gsel]
            )
            neigh = np.empty((len(nodes), k + 1), np.int64)
            neigh[:, 0] = nodes
            for r, v in enumerate(nodes):
                lo, hi = ds.nbr_offsets[v], ds.nbr_offsets[v + 1]
                neigh[r, 1:] = (rng.choice(ds.nbr_ids[lo:hi], k)
                                if hi > lo else v)
            samp = log_uniform_unique(n_nodes, nsampled, rng)
            opt.zero_grad()
            logits = model(
                x_concat,
                torch.from_numpy(neigh),
                torch.from_numpy(nodes),
                torch.from_numpy(samp),
            )
            loss = torch.sum(logits)
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 0.5)
            opt.step()
            tot += float(loss.item())
        cost.append(tot)
        if ep > 5 and cost[-1] > np.mean(cost[-6:-1]):
            sched.step()
        model.eval()
        mean, std = probe()
        if mean > best[0]:
            best = (mean, std)
        log_fn(f"epoch {ep} loss {tot:.1f} probe {mean:.4f}")
    return {"best_mean": best[0], "best_std": best[1],
            "init_probe": init_acc}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="PTC")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--t", type=int, default=1)
    ap.add_argument("--ff", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=0.005)
    ap.add_argument("--sampled", type=int, default=512)
    ap.add_argument("--seeds", type=int, default=2)
    args = ap.parse_args()

    prev = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            prev = json.load(f)
    results = prev.setdefault(args.dataset, {})
    for mode in ("ordered", "permuted"):
        rows = results.setdefault(mode, [])
        for s in range(len(rows), args.seeds):
            ds = load_tu_dataset(args.dataset)
            if mode == "permuted":
                ds = permute_graphs(ds, seed=100 + s)
            t0 = time.time()
            r = train_probe(
                ds, epochs=args.epochs, batch=args.batch, k=args.k,
                t=args.t, ff=args.ff, lr=args.lr, nsampled=args.sampled,
                seed=s,
                log_fn=lambda m: print(f"[{mode} s{s}] {m}", flush=True),
            )
            r["seconds"] = time.time() - t0
            rows.append(r)
            with open(OUT, "w") as f:
                json.dump(prev, f, indent=1)
    om = [r["best_mean"] for r in results["ordered"]]
    pm = [r["best_mean"] for r in results["permuted"]]
    results["summary"] = {
        "ordered_mean": float(np.mean(om)),
        "permuted_mean": float(np.mean(pm)),
        "collapse": float(np.mean(om) - np.mean(pm)),
        "config": vars(args),
    }
    with open(OUT, "w") as f:
        json.dump(prev, f, indent=1)
    print(json.dumps(results["summary"]))


if __name__ == "__main__":
    main()
