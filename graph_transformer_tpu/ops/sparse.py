"""Sparse gather/scatter substrate: pooling, SpMM, SDDMM, edge softmax.

The reference materializes sparse structure as ``torch.sparse`` matrices
(graph_pool: ``train_pytorch_U2GNN_Sup.py:73-89``; GCN ``spmm``:
``layers.py:38-44``) and — worse — a dense ``N×N`` attention matrix for GAT
(``layers.py:80-88``).  On TPU the idiomatic substrate is segment reductions
over padded edge lists: XLA lowers ``segment_sum`` to efficient scatters and
fuses the surrounding elementwise work, and every shape is static.

All functions are mask-aware: padding edges carry ``edge_mask == 0`` and
padding nodes ``node_mask == 0``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def graph_sum_pool(
    node_vec: jax.Array,  # [N_pad, D]
    graph_id: jax.Array,  # [N_pad] i32, padding rows -> num_graphs
    num_graphs: int,
) -> jax.Array:
    """Graph-level sum pooling: [B, D].

    Replaces the sparse graph_pool matmul (``torch.spmm(graph_pool, ...)``,
    ``pytorch_U2GNN_Sup.py:41``) with a segment sum; padding rows land in the
    extra segment ``B`` and are sliced off.
    """
    pooled = jax.ops.segment_sum(
        node_vec, graph_id, num_segments=num_graphs + 1
    )
    return pooled[:num_graphs]


def spmm(
    edge_src: jax.Array,  # [E_pad] i32
    edge_dst: jax.Array,  # [E_pad] i32
    edge_val: jax.Array,  # [E_pad] f32 (0 on padding)
    x: jax.Array,  # [N_pad, D]
    num_nodes: int,
) -> jax.Array:
    """y[dst] += val * x[src] — sparse A @ X with A given as COO edges.

    The GCN aggregation ``spmm(adj, X @ W)`` of ``layers.py:38-44`` maps here
    with ``edge_val`` the normalized adjacency weights.
    """
    msg = x[edge_src] * edge_val[:, None]
    return jax.ops.segment_sum(msg, edge_dst, num_segments=num_nodes)


def gcn_norm_edges(
    edge_src: jax.Array,
    edge_dst: jax.Array,
    edge_mask: jax.Array,
    num_nodes: int,
    add_self_loops: bool = True,
):
    """Symmetric GCN normalization D^-1/2 (A + I) D^-1/2 as edge values.

    Returns (src, dst, val) with self-loop edges appended (so the output edge
    arrays have length E_pad + N_pad).  Degree counts use the mask, so padding
    edges contribute nothing.  Matches the Kipf normalization used by the
    reference's GCN baselines (``gcn_baseline/train_unsup_gcn.py:53-72``).
    """
    deg = jax.ops.segment_sum(edge_mask, edge_dst, num_segments=num_nodes)
    if add_self_loops:
        deg = deg + 1.0
        loop = jnp.arange(num_nodes, dtype=edge_src.dtype)
        edge_src = jnp.concatenate([edge_src, loop])
        edge_dst = jnp.concatenate([edge_dst, loop])
        edge_mask = jnp.concatenate([edge_mask, jnp.ones(num_nodes, edge_mask.dtype)])
    dinv = jax.lax.rsqrt(jnp.maximum(deg, 1e-12))
    val = dinv[edge_src] * dinv[edge_dst] * edge_mask
    return edge_src, edge_dst, val


def edge_softmax(
    scores: jax.Array,  # [E_pad] raw edge scores
    edge_dst: jax.Array,  # [E_pad] i32 — softmax normalizes over incoming edges
    edge_mask: jax.Array,  # [E_pad]
    num_nodes: int,
) -> jax.Array:
    """Numerically-stable per-destination softmax over edges.

    This is the sparse rebuild of the reference GAT's dense ``N×N`` matrix
    filled with ``-1e20`` then row-softmaxed (``layers.py:83-85``): a
    segment-max subtraction followed by a segment-sum normalization.
    """
    neg = jnp.asarray(-1e30, scores.dtype)
    masked = jnp.where(edge_mask > 0, scores, neg)
    smax = jax.ops.segment_max(masked, edge_dst, num_segments=num_nodes)
    smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
    ex = jnp.exp(masked - smax[edge_dst]) * edge_mask
    denom = jax.ops.segment_sum(ex, edge_dst, num_segments=num_nodes)
    return ex / jnp.maximum(denom[edge_dst], 1e-16)


def sddmm_dot(
    edge_src: jax.Array,
    edge_dst: jax.Array,
    a: jax.Array,  # [N, D]
    b: jax.Array,  # [N, D]
) -> jax.Array:
    """Per-edge dot products <a[src], b[dst]> (sampled dense-dense matmul)."""
    return jnp.sum(a[edge_src] * b[edge_dst], axis=-1)


def global_regather(
    out: jax.Array,  # [N_pad, D] batch-local layer output
    node_gidx: jax.Array,  # [N_pad] dataset-global ids (pad -> 0)
    node_mask: jax.Array,  # [N_pad]
    neigh_global: jax.Array,  # [N_pad, K+1] *global* sampled neighbor ids
    num_total_nodes: int,
) -> jax.Array:
    """Inter-layer re-gather for the fast (global-id) sampling path.

    The Pallas fast sampler (``sampling/pallas_sampler.py``) emits *global*
    neighbor ids — remapping them to batch-local ids costs ~0.8 ms of
    narrow XLA gathers at bench shapes, while D-wide row gathers cost only
    ~0.14 ms (BASELINE.md round-3 profile).  So deeper U2GNN stacks
    re-gather through a ``[total+1, D]`` scratch instead: scatter each
    batch row to its global slot (padding rows go to the dummy slot
    ``num_total_nodes`` — ``node_gidx`` pads to 0, which would clobber a
    real node), then row-gather the global neighborhoods.  Graphs are
    disjoint, so every real neighbor id is present in the batch and the
    gather never reads a stale slot.  Replaces ``out[batch.neigh]``
    (``pytorch_U2GNN_Sup.py:39``) on the fast path.

    Scaling note (ADVICE r3): the scratch is ``[num_total_nodes+1, D]``
    *per regather per step* — it scales with the dataset, not the batch,
    and fold-vmapped runners multiply it by num_folds.  Fine for TU-scale
    datasets (NCI1: 4.1 M nodes × D=64 f32 × 10 folds ≈ 10 GB would NOT be
    — but NCI feature dims are ~37 and deep global-path stacks are gated);
    callers with large node counts must fall back to the batch-local CSR
    path (``neigh_global=None``).  The assert below makes the trap loud.
    """
    assert num_total_nodes <= 2_000_000, (
        f"global_regather scratch would be [{num_total_nodes + 1}, "
        f"{out.shape[-1]}] per regather per step (x num_folds under "
        "fold-vmap); use the batch-local path (neigh_global=None) for "
        "large-node-count datasets"
    )
    idx = jnp.where(node_mask > 0, node_gidx, num_total_nodes)
    buf = jnp.zeros((num_total_nodes + 1, out.shape[-1]), out.dtype)
    buf = buf.at[idx].set(out, mode="drop")
    return buf[neigh_global]
