"""On-device fixed-fanout neighborhood sampling.

The reference resamples neighborhoods on the host every step with pure-Python
loops (``train_pytorch_U2GNN_Sup.py:101-113``) — its dominant host cost.  Here
the dataset's CSR adjacency lives in device memory once, and per-step sampling
is two gathers + one ``jax.random.randint`` inside the jitted train step, so
the TPU never waits on the host.

Semantics match the reference: K neighbors sampled uniformly *with
replacement* from the (deduplicated, bidirected) neighbor list, self at
slot 0, isolated nodes filled with self.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from graph_transformer_tpu.data.tu import GraphDataset


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceCSR:
    """CSR adjacency in device memory (global node ids)."""

    offsets: jax.Array  # [N+1] i32
    nbr_ids: jax.Array  # [2E] i32
    degrees: jax.Array  # [N] i32

    @staticmethod
    def from_dataset(ds: GraphDataset) -> "DeviceCSR":
        return DeviceCSR(
            offsets=jnp.asarray(ds.nbr_offsets, dtype=jnp.int32),
            nbr_ids=jnp.asarray(ds.nbr_ids, dtype=jnp.int32),
            degrees=jnp.asarray(ds.degrees, dtype=jnp.int32),
        )


def sample_neighborhoods(
    key: jax.Array,
    csr: DeviceCSR,
    node_gidx: jax.Array,  # [N] i32 global node ids
    num_neighbors: int,
) -> jax.Array:
    """Sample ``[N, K+1]`` *global* neighbor ids (slot 0 = self).

    Uniform with replacement over each node's CSR neighbor list; nodes with
    degree 0 are filled with themselves
    (reference semantics: ``train_pytorch_U2GNN_Sup.py:107-113``).
    """
    n = node_gidx.shape[0]
    deg = csr.degrees[node_gidx]  # [N]
    off = csr.offsets[node_gidx]  # [N]
    r = jax.random.randint(
        key, (n, num_neighbors), 0, jnp.maximum(deg, 1)[:, None], dtype=jnp.int32
    )
    nbr = csr.nbr_ids[off[:, None] + r]  # [N, K]
    nbr = jnp.where(deg[:, None] > 0, nbr, node_gidx[:, None])
    return jnp.concatenate([node_gidx[:, None], nbr], axis=1)


def global_to_local(
    neigh_global: jax.Array,  # [N_pad, K+1] global ids
    node_gidx: jax.Array,  # [N_pad] global ids of batch slots
    total_nodes: int,
    node_mask: Optional[jax.Array] = None,  # [N_pad] 1.0 for real slots
) -> jax.Array:
    """Convert globally-indexed neighborhoods to batch-local slot indices.

    Builds a scatter table global→local (int32 [total_nodes+1]); neighbors of
    real nodes always lie inside the same graph and hence inside the batch.
    Padding slots all carry ``node_gidx == 0`` and would clobber the mapping
    of global node 0, so their writes are routed to a sentinel row.
    """
    g2l = jnp.zeros((total_nodes + 1,), dtype=jnp.int32)
    write_idx = node_gidx
    if node_mask is not None:
        write_idx = jnp.where(node_mask > 0, node_gidx, total_nodes)
    g2l = g2l.at[write_idx].set(
        jnp.arange(node_gidx.shape[0], dtype=jnp.int32)
    )
    return g2l[neigh_global]


def resample_batch_neighbors(
    key: jax.Array,
    csr: DeviceCSR,
    node_gidx: jax.Array,  # [N_pad]
    node_mask: jax.Array,  # [N_pad]
    num_neighbors: int,
    total_nodes: int,
) -> jax.Array:
    """Fresh ``[N_pad, K+1]`` batch-local neighborhoods for a padded batch.

    Padding slots (mask 0) self-point.  Intended to be called inside the
    jitted train step so every step sees fresh fanout samples without host
    round-trips.
    """
    neigh_g = sample_neighborhoods(key, csr, node_gidx, num_neighbors)
    neigh_l = global_to_local(neigh_g, node_gidx, total_nodes, node_mask)
    self_l = jnp.arange(node_gidx.shape[0], dtype=jnp.int32)[:, None]
    return jnp.where(node_mask[:, None] > 0, neigh_l, self_l)


def build_padded_neighbor_table(
    ds: GraphDataset, max_degree: int | None = None
) -> np.ndarray:
    """Optional dense ``[N, max_deg]`` padded neighbor table (self-padded).

    Trades HBM for one gather instead of two; useful when the degree
    distribution is tight.  Not used by default (power-law graphs waste too
    much memory here — CSR + double gather is the default path).
    """
    deg = ds.degrees
    md = int(deg.max()) if max_degree is None else max_degree
    n = ds.num_nodes
    table = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, md))
    for v in range(n):
        s, e = ds.nbr_offsets[v], ds.nbr_offsets[v + 1]
        take = min(md, e - s)
        table[v, :take] = ds.nbr_ids[s : s + take]
    return table
