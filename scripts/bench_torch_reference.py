"""Measure the reference implementation's training throughput (edges/s).

An independent PyTorch re-implementation of the reference's supervised
training step — same math as ``train_pytorch_U2GNN_Sup.py``: per-batch
Python/numpy neighborhood sampling (host), ``nn.TransformerEncoder`` forward,
soft-label CE backward, Adam — run on CPU (the reference is
cuda-if-available-else-cpu and this box has no CUDA torch).

The resulting edges/s number is pinned as ``REFERENCE_EDGES_PER_S`` in
``bench.py`` for the ``vs_baseline`` ratio.

Run: python scripts/bench_torch_reference.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import numpy as np
import torch

from graph_transformer_tpu.data.tu import synthetic_powerlaw_dataset
from graph_transformer_tpu.data.batching import BatchBuilder

_ap = argparse.ArgumentParser()
_ap.add_argument("--batch", type=int, default=4)
_ap.add_argument("--k", type=int, default=8)
_ap.add_argument("--t", type=int, default=4)
_ap.add_argument("--ff", type=int, default=1024)
_ap.add_argument("--steps", type=int, default=3)
_args = _ap.parse_args()
# defaults = the reference README batch size; pass --batch 16 to pin the
# exact bench.py workload (VERDICT: vs_baseline must compare identical
# (batch, k, T, ff))
BATCH, K, T, FF, EPOCH_STEPS = _args.batch, _args.k, _args.t, _args.ff, _args.steps


class RefU2GNNSup(torch.nn.Module):
    """Reference-semantics supervised U2GNN (pytorch_U2GNN_Sup.py:14-46)."""

    def __init__(self, d, c, ff, t):
        super().__init__()
        layer = torch.nn.TransformerEncoderLayer(
            d_model=d, nhead=1, dim_feedforward=ff, dropout=0.5
        )
        self.enc = torch.nn.TransformerEncoder(layer, t)
        self.drop = torch.nn.Dropout(0.5)
        self.head = torch.nn.Linear(d, c)

    def forward(self, input_x, pool, x_concat):
        input_tr = torch.nn.functional.embedding(input_x, x_concat)
        # intended semantics (TF impl, model_U2GNN_Sup_multi.py:14-15):
        # sequence = K+1 neighborhood, batch = nodes.  (The PyTorch
        # reference's accidental node-axis attention is O(N²) in batch nodes
        # and intractable at REDDIT scale even as a baseline.)
        out = self.enc(input_tr.transpose(0, 1))[0]
        graph_emb = torch.spmm(pool, out)
        return self.head(self.drop(graph_emb))


def main():
    torch.set_num_threads(torch.get_num_threads())
    ds = synthetic_powerlaw_dataset(
        "REDDITMULTI5K-like", num_graphs=64, mean_nodes=509, seed=0
    )
    builder = BatchBuilder(ds, batch_size=BATCH, num_neighbors=K, seed=0)
    model = RefU2GNNSup(ds.feature_dim, ds.num_classes, FF, T)
    opt = torch.optim.Adam(model.parameters(), lr=5e-4)

    def step():
        b = builder.sample()  # includes host-side neighbor sampling, as ref
        n_real = int(np.asarray(b.node_mask).sum())
        input_x = torch.from_numpy(np.asarray(b.neigh)[:n_real].astype(np.int64))
        x_concat = torch.from_numpy(np.asarray(b.x)[:n_real])
        gid = np.asarray(b.graph_id)[:n_real]
        idx = torch.from_numpy(np.stack([gid, np.arange(n_real)]).astype(np.int64))
        pool = torch.sparse_coo_tensor(
            idx, torch.ones(n_real), (BATCH, n_real)
        ).coalesce()
        labels = torch.from_numpy(np.asarray(b.labels).astype(np.int64))
        scores = model(input_x, pool, x_concat)
        # soft-label CE with smoothing 0.1 (train_pytorch_U2GNN_Sup.py:140-142)
        c = scores.shape[1]
        smooth = torch.full((BATCH, c), 0.1 / (c - 1))
        smooth.scatter_(1, labels[:, None], 0.9)
        loss = -(smooth * torch.log_softmax(scores, dim=1)).sum(1).mean()
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 0.5)
        opt.step()
        return int(np.asarray(b.edge_mask).sum())

    step()  # warmup
    t0 = time.time()
    edges = sum(step() for _ in range(EPOCH_STEPS))
    dt = time.time() - t0
    print(f"torch reference: {edges/dt:,.0f} edges/s  ({dt/EPOCH_STEPS*1e3:.1f} ms/step)")


if __name__ == "__main__":
    main()
