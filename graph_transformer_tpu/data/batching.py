"""Device-ready padded graph batches.

XLA compiles one program per shape, so the ragged graph batch
(variable graphs / nodes / degrees) is padded to a *fixed* per-dataset shape
here, once, at the data layer.  Everything downstream — neighborhood
attention, SpMM, pooling, losses — is static-shape and mask-aware.

This replaces the reference's per-batch Python dict building
(``train_pytorch_U2GNN_Sup.py:91-119``: O(E + N·K) pure-Python per step, its
dominant host cost) with vectorized O(N+E) numpy, and replaces the
``torch.sparse`` graph_pool matrix (``:73-89``) with segment ids consumed by
``jax.ops.segment_sum``.

Layout of a :class:`GraphBatch` (B graphs, padded to N_pad nodes / E_pad
directed edges):

- ``x``          [N_pad, D]   node features (zeros on padding)
- ``neigh``      [N_pad, K+1] batch-local neighbor indices, slot 0 = self;
                 sampled with replacement; isolated node → all-self
                 (semantics: ``train_pytorch_U2GNN_Sup.py:107-113``)
- ``graph_id``   [N_pad]      owning graph in [0, B); padding rows get B so a
                 ``segment_sum`` with B+1 segments drops them
- ``node_gidx``  [N_pad]      dataset-global node id (the sampled-softmax
                 label, ``input_y`` of ``train_pytorch_U2GNN_UnSup.py:126``)
- ``node_mask``  [N_pad]      1.0 for real nodes
- ``edge_src/dst`` [E_pad]    batch-local directed edges, ``edge_mask`` 1.0 real
- ``labels``     [B]          graph labels
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np

from graph_transformer_tpu.data.tu import GraphDataset


def pad_to_multiple(n: int, m: int) -> int:
    return ((int(n) + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GraphBatch:
    x: jax.Array  # [N_pad, D] f32
    neigh: jax.Array  # [N_pad, K+1] i32 (batch-local)
    graph_id: jax.Array  # [N_pad] i32 (pad -> B)
    node_gidx: jax.Array  # [N_pad] i32 (global node ids, pad -> 0)
    node_mask: jax.Array  # [N_pad] f32
    edge_src: jax.Array  # [E_pad] i32 (batch-local, pad -> 0)
    edge_dst: jax.Array  # [E_pad] i32
    edge_mask: jax.Array  # [E_pad] f32
    labels: jax.Array  # [B] i32

    @property
    def num_graphs(self) -> int:
        return self.labels.shape[0]

    @property
    def n_pad(self) -> int:
        return self.x.shape[0]


class BatchBuilder:
    """Assembles fixed-shape :class:`GraphBatch` objects from a dataset.

    One instance per (dataset, batch_size, fanout) tuple; the padded sizes are
    chosen once so every batch compiles to the same XLA program.
    """

    def __init__(
        self,
        ds: GraphDataset,
        batch_size: int,
        num_neighbors: int,
        pad_multiple: int = 128,
        seed: int = 123,
        indices: Optional[np.ndarray] = None,
        backend: str = "auto",  # auto | native | numpy
    ):
        self.ds = ds
        self.batch_size = int(batch_size)
        self.K = int(num_neighbors)
        self.rng = np.random.default_rng(seed)
        self.indices = (
            np.arange(ds.num_graphs) if indices is None else np.asarray(indices)
        )
        self._native = None
        if backend in ("auto", "native"):
            try:
                from graph_transformer_tpu.native.batcher import (
                    NativeBatchAssembler,
                )

                self._native = NativeBatchAssembler(ds)
            except Exception:
                if backend == "native":
                    raise

        sizes = ds.graph_num_nodes
        deg = ds.degrees.astype(np.int64)
        # per-graph directed edge counts via cumulative degree at graph bounds
        ecnt = np.diff(
            np.concatenate([[0], np.cumsum(deg)])[ds.graph_offsets]
        )

        k = min(self.batch_size, ds.num_graphs)
        self.n_pad = pad_to_multiple(
            int(np.sort(sizes)[-k:].sum()), pad_multiple
        )
        self.e_pad = max(
            pad_to_multiple(int(np.sort(ecnt)[-k:].sum()), pad_multiple), pad_multiple
        )
        self._deg = deg.astype(np.int64)
        self._local_cache: dict = {}

    # ------------------------------------------------------------------ build
    def build(
        self, graph_indices: Sequence[int], rng: Optional[np.random.Generator] = None
    ) -> GraphBatch:
        """Assemble one padded batch for the given graph ids.

        Uses the native C++ assembler when built (one pass, no numpy temp
        churn; ``native/batcher.cpp``), else the vectorized numpy path."""
        ds = self.ds
        rng = rng or self.rng
        g = np.asarray(graph_indices, dtype=np.int64)
        if self._native is not None:
            out = self._native.assemble(
                g, self.K, self.n_pad, self.e_pad,
                seed=int(rng.integers(0, 2**63 - 1)),
            )
            return GraphBatch(
                x=out["x"],
                neigh=out["neigh"],
                graph_id=out["graph_id"],
                node_gidx=out["node_gidx"],
                node_mask=out["node_mask"],
                edge_src=out["edge_src"],
                edge_dst=out["edge_dst"],
                edge_mask=out["edge_mask"],
                labels=ds.labels[g].astype(np.int32),
            )
        B = len(g)
        sizes = ds.graph_num_nodes[g].astype(np.int64)
        starts = ds.graph_offsets[g]
        total = int(sizes.sum())
        if total > self.n_pad:
            raise ValueError(f"batch has {total} nodes > n_pad={self.n_pad}")

        local_start = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        seg = np.repeat(np.arange(B), sizes)  # [total] graph slot per node
        within = np.arange(total) - np.repeat(local_start, sizes)
        gidx = (starts[seg] + within).astype(np.int64)  # global node ids

        # fixed-fanout sampling with replacement; isolated -> self
        deg_n = self._deg[gidx]
        off_n = ds.nbr_offsets[gidx]
        r = rng.integers(0, np.maximum(deg_n, 1)[:, None], size=(total, self.K))
        nbr_g = ds.nbr_ids[off_n[:, None] + r].astype(np.int64)
        nbr_g = np.where(deg_n[:, None] > 0, nbr_g, gidx[:, None])
        # global -> batch-local (neighbors never cross graph boundaries)
        shift = (local_start - starts)[seg]  # [total]
        nbr_l = (nbr_g + shift[:, None]).astype(np.int32)
        self_l = np.arange(total, dtype=np.int32)
        neigh = np.concatenate([self_l[:, None], nbr_l], axis=1)

        # edges (CSR expansion of the selected graphs)
        e_per_node = deg_n
        e_total = int(e_per_node.sum())
        if e_total > self.e_pad:
            raise ValueError(f"batch has {e_total} edges > e_pad={self.e_pad}")
        e_start = np.concatenate([[0], np.cumsum(e_per_node)[:-1]])
        ptr = np.repeat(off_n, e_per_node) + (
            np.arange(e_total) - np.repeat(e_start, e_per_node)
        )
        edge_dst_g = ds.nbr_ids[ptr].astype(np.int64)
        edge_seg = np.repeat(seg, e_per_node)
        edge_src = np.repeat(self_l, e_per_node).astype(np.int32)
        edge_dst = (edge_dst_g + (local_start - starts)[edge_seg]).astype(np.int32)

        # padding
        N_pad, E_pad = self.n_pad, self.e_pad
        x = np.zeros((N_pad, ds.feature_dim), dtype=np.float32)
        x[:total] = ds.node_feat[gidx]
        neigh_p = np.tile(np.arange(N_pad, dtype=np.int32)[:, None], (1, self.K + 1))
        neigh_p[:total] = neigh
        graph_id = np.full(N_pad, B, dtype=np.int32)
        graph_id[:total] = seg
        node_gidx = np.zeros(N_pad, dtype=np.int32)
        node_gidx[:total] = gidx
        node_mask = np.zeros(N_pad, dtype=np.float32)
        node_mask[:total] = 1.0
        es = np.zeros(E_pad, dtype=np.int32)
        ed = np.zeros(E_pad, dtype=np.int32)
        em = np.zeros(E_pad, dtype=np.float32)
        es[:e_total] = edge_src
        ed[:e_total] = edge_dst
        em[:e_total] = 1.0

        return GraphBatch(
            x=x,
            neigh=neigh_p,
            graph_id=graph_id,
            node_gidx=node_gidx,
            node_mask=node_mask,
            edge_src=es,
            edge_dst=ed,
            edge_mask=em,
            labels=ds.labels[g].astype(np.int32),
        )

    def sample(self) -> GraphBatch:
        """Random batch: a random subset of ``batch_size`` training graphs
        (sampling with replacement across an epoch — each batch an independent
        random subset, reference ``train_pytorch_U2GNN_Sup.py:121-126``)."""
        sel = self.rng.permutation(len(self.indices))[: self.batch_size]
        return self.build(self.indices[sel])

    def eval_batches(self, eval_indices: Sequence[int]):
        """Deterministic batches covering eval_indices in order, last batch
        padded by repeating the final graph (masked out by the caller via the
        returned count)."""
        idx = np.asarray(eval_indices)
        for i in range(0, len(idx), self.batch_size):
            chunk = idx[i : i + self.batch_size]
            n_real = len(chunk)
            if n_real < self.batch_size:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1], self.batch_size - n_real)]
                )
            yield self.build(chunk), n_real


def whole_dataset_batch(
    ds: GraphDataset,
    num_neighbors: int,
    pad_multiple: int = 128,
    seed: int = 123,
) -> GraphBatch:
    """One batch containing every graph — the transductive unsupervised mode
    (the reference trains on ALL graphs with a whole-dataset graph_pool,
    ``train_pytorch_U2GNN_UnSup.py:92-94``, ``README.md:53``)."""
    builder = BatchBuilder(
        ds,
        batch_size=ds.num_graphs,
        num_neighbors=num_neighbors,
        pad_multiple=pad_multiple,
        seed=seed,
    )
    return builder.build(np.arange(ds.num_graphs))
