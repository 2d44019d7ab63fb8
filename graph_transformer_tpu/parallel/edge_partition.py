"""Edge-partitioned data parallelism with explicit boundary exchange.

The scaling design from BASELINE.md's north star: partition the block-
diagonal batch graph across chips, keep neighborhood attention local, and
exchange only boundary-node vectors over ICI between layers.

Two regimes:

1. **Graph-granular batches** (graph classification): the partitioner
   assigns *whole graphs* to shards balanced by edge count (LPT greedy).
   Neighbor lists never cross graph boundaries, so there is no halo at all —
   each shard trains on its sub-batch and only the gradient ``psum`` rides
   the interconnect.  :func:`make_shard_map_train_step` builds this step as
   an explicit ``shard_map`` (no GSPMD guessing).

2. **Node-partitioned single graph** (transductive node embeddings, REDDIT-
   scale components): nodes of one graph are range-partitioned across
   shards; sampled neighborhoods reference remote nodes.  The
   :class:`HaloPlan` precomputes, per shard, a fixed-size **export buffer**
   (the local rows other shards will need) and gather indices into the
   all-gathered export stack.  At runtime the exchange is one
   ``jax.lax.all_gather`` of ``[H, D]`` per shard — static shapes, one
   collective per U2GNN layer re-gather.

All plan construction is host-side numpy; runtime paths are jit/shard_map
with static shapes throughout.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graph_transformer_tpu.data.batching import BatchBuilder, GraphBatch
from graph_transformer_tpu.data.tu import GraphDataset


# ----------------------------------------------------------------- partition
def partition_graphs_by_edges(
    ds: GraphDataset, graph_ids: Sequence[int], n_shards: int
) -> List[np.ndarray]:
    """LPT greedy: heaviest graph (by directed edge count) to lightest shard.

    Balances *edges* (the actual work), not node or graph counts — the
    partition-balance requirement of SURVEY.md §7.3#4.
    """
    g = np.asarray(graph_ids)
    deg = ds.degrees.astype(np.int64)
    cum = np.concatenate([[0], np.cumsum(deg)])
    ecnt = cum[ds.graph_offsets[g + 1]] - cum[ds.graph_offsets[g]]
    order = np.argsort(-ecnt)
    loads = np.zeros(n_shards, dtype=np.int64)
    shards: List[List[int]] = [[] for _ in range(n_shards)]
    for idx in order:
        s = int(np.argmin(loads))
        shards[s].append(int(g[idx]))
        loads[s] += int(ecnt[idx])
    return [np.asarray(s, dtype=np.int64) for s in shards]


def edge_balance(ds: GraphDataset, shards: List[np.ndarray]) -> float:
    """max/mean edge load across shards (1.0 = perfect balance)."""
    deg = ds.degrees.astype(np.int64)
    cum = np.concatenate([[0], np.cumsum(deg)])
    loads = np.array([
        int((cum[ds.graph_offsets[s + 1]] - cum[ds.graph_offsets[s]]).sum())
        for s in shards
    ])
    return float(loads.max() / max(loads.mean(), 1.0))


class ShardedBatchBuilder:
    """Builds ``[n_shards, ...]``-stacked :class:`GraphBatch` pytrees whose
    leading axis shards over the mesh 'data' axis.  Every shard is padded to
    the same local sizes so the stacked batch is one static-shape array
    per field."""

    def __init__(
        self,
        ds: GraphDataset,
        n_shards: int,
        batch_size: int,  # per shard
        num_neighbors: int,
        pad_multiple: int = 128,
        seed: int = 123,
        indices: Optional[np.ndarray] = None,
    ):
        self.ds = ds
        self.n_shards = n_shards
        self.builder = BatchBuilder(
            ds, batch_size, num_neighbors, pad_multiple, seed, indices
        )
        self.rng = np.random.default_rng(seed + 17)
        self.indices = self.builder.indices

    @property
    def n_pad_local(self) -> int:
        return self.builder.n_pad

    def build(self, per_shard_graphs: List[np.ndarray]) -> GraphBatch:
        batches = [self.builder.build(g) for g in per_shard_graphs]
        return jax.tree_util.tree_map(
            lambda *xs: np.stack(xs, axis=0), *batches
        )

    def sample(self) -> GraphBatch:
        """Random balanced sample: draw n_shards·batch_size graphs, LPT-
        partition them by edges, pad each shard to batch_size graphs."""
        want = self.n_shards * self.builder.batch_size
        sel = self.rng.permutation(len(self.indices))[:want]
        shards = partition_graphs_by_edges(
            self.ds, self.indices[sel], self.n_shards
        )
        out = []
        for s in shards:
            if len(s) < self.builder.batch_size:
                fill = self.rng.choice(
                    self.indices, self.builder.batch_size - len(s)
                )
                s = np.concatenate([s, fill])
            out.append(s[: self.builder.batch_size])
        return self.build(out)


# ------------------------------------------------------------------- dp step
def make_shard_map_train_step(
    loss_fn: Callable,  # (params, local_batch, key) -> local scalar loss
    opt,
    mesh: Mesh,
    donate: bool = True,
):
    """Explicit-DP train step: per-shard forward/backward on the local
    sub-batch, gradient ``psum`` over 'data', replicated update.

    ``loss_fn`` must return the *sum*-convention local loss (losses psum to
    the global objective)."""
    from jax import shard_map

    def step(params, opt_state, stacked_batch, key):
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), jax.tree_util.tree_map(lambda _: P("data"), stacked_batch), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        def grad_local(p, local, k):
            local = jax.tree_util.tree_map(lambda x: x[0], local)  # drop shard axis
            k = jax.random.fold_in(k, jax.lax.axis_index("data"))
            loss, grads = jax.value_and_grad(loss_fn)(p, local, k)
            grads = jax.lax.psum(grads, "data")
            loss = jax.lax.psum(loss, "data")
            return loss, grads

        loss, grads = grad_local(params, stacked_batch, key)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1) if donate else ())


# ------------------------------------------------- node-range partitioning
@dataclasses.dataclass
class NodeRangePartition:
    """Edge-balanced contiguous node ranges, renumbered and padded so every
    shard owns exactly ``n_local`` consecutive new ids (the static layout
    :class:`HaloPlan` requires).

    The reference's node order is graph-contiguous, so contiguous ranges
    keep locality; the *cut points* are chosen by cumulative degree so each
    range carries ~1/S of the edges (SURVEY §7.3#4 "partition balance
    (edges, not nodes)") — on power-law graphs an equal-node split hands one
    shard the hubs and with them most of the export traffic.
    """

    n_shards: int
    n_local: int  # padded, equal for every shard
    cuts: np.ndarray  # [S+1] original-order cut points
    new_of_old: np.ndarray  # [N_old] i32 — new id of each original node
    old_of_new: np.ndarray  # [S*n_local] i32 — original id, -1 for padding
    valid: np.ndarray  # [S*n_local] bool — False on padding rows

    @property
    def num_new_nodes(self) -> int:
        return self.n_shards * self.n_local


def partition_nodes_by_edges(
    degrees: np.ndarray,
    n_shards: int,
    pad_multiple: int = 8,
    neigh: Optional[np.ndarray] = None,
    crossing_window: float = 0.1,
) -> NodeRangePartition:
    """Cut the (graph-contiguous) node axis into ``n_shards`` contiguous
    ranges of ~equal *edge* mass, then renumber so shard ``s`` owns new ids
    ``[s*n_local, (s+1)*n_local)`` with padding at each range's tail.

    With ``neigh`` (the [N, K+1] sampled neighborhood table) each cut point
    additionally slides within ``±crossing_window·N/S`` of its edge-balanced
    target to the position crossed by the fewest neighbor references —
    graph datasets are node-contiguous per graph, so a cut landing *between*
    graphs (or at a sparse articulation) exports dramatically fewer rows
    than one slicing through a graph's middle."""
    deg = np.asarray(degrees, dtype=np.int64)
    n = deg.shape[0]
    cum = np.concatenate([[0], np.cumsum(deg)])
    targets = cum[-1] * np.arange(1, n_shards) / n_shards
    inner = np.searchsorted(cum, targets)
    if neigh is not None and crossing_window > 0.0 and n_shards > 1:
        # span[c] = #references (i -> j) whose interval (min, max] contains
        # the boundary between node c-1 and node c
        assert neigh.shape[0] == n, (
            "neigh must cover exactly the nodes being partitioned"
        )
        src = np.repeat(np.arange(n, dtype=np.int64), neigh.shape[1] - 1)
        dst = np.asarray(neigh[:, 1:], dtype=np.int64).reshape(-1)
        assert dst.max() < n, "neighbor ids must be < len(degrees)"
        lo = np.minimum(src, dst)
        hi = np.maximum(src, dst)
        diff = np.zeros(n + 2, dtype=np.int64)
        np.add.at(diff, lo + 1, 1)
        np.add.at(diff, hi + 1, -1)
        span = np.cumsum(diff)[: n + 1]  # index c = cut before node c
        w = max(1, int(crossing_window * n / n_shards))
        adjusted = []
        for c in inner:
            a, b = max(1, int(c) - w), min(n - 1, int(c) + w)
            if a > b:
                adjusted.append(int(c))
                continue
            adjusted.append(a + int(np.argmin(span[a : b + 1])))
        inner = np.asarray(adjusted, dtype=np.int64)
    cuts = np.concatenate([[0], np.clip(inner, 0, n), [n]]).astype(np.int64)
    cuts = np.maximum.accumulate(cuts)  # monotone even on degenerate degrees
    sizes = np.diff(cuts)
    n_local = int(-(-max(int(sizes.max()), 1) // pad_multiple) * pad_multiple)

    new_of_old = np.empty(n, dtype=np.int32)
    old_of_new = np.full(n_shards * n_local, -1, dtype=np.int32)
    for s in range(n_shards):
        lo, hi = cuts[s], cuts[s + 1]
        new_of_old[lo:hi] = s * n_local + np.arange(hi - lo, dtype=np.int32)
        old_of_new[s * n_local : s * n_local + (hi - lo)] = np.arange(
            lo, hi, dtype=np.int32
        )
    return NodeRangePartition(
        n_shards=n_shards,
        n_local=n_local,
        cuts=cuts,
        new_of_old=new_of_old,
        old_of_new=old_of_new,
        valid=old_of_new >= 0,
    )


def apply_node_partition(
    part: NodeRangePartition,
    neigh: np.ndarray,  # [N_old, K+1] sampled neighborhoods (self slot 0)
    x: np.ndarray,  # [N_old, D] node features
) -> Tuple[np.ndarray, np.ndarray]:
    """Remap a neighborhood table + feature matrix into the partition's new
    id space.  Padding rows get self-only neighborhoods and zero features —
    they compute dead rows whose loss the caller masks with ``part.valid``."""
    n_new = part.num_new_nodes
    k1 = neigh.shape[1]
    neigh_new = np.tile(
        np.arange(n_new, dtype=np.int32)[:, None], (1, k1)
    )
    neigh_new[part.new_of_old] = part.new_of_old[neigh]
    x_new = np.zeros((n_new, x.shape[1]), dtype=x.dtype)
    x_new[part.new_of_old] = x
    return neigh_new, x_new


# -------------------------------------------------------------- halo exchange
@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HaloPlan:
    """Static exchange plan for a node-range-partitioned graph.

    Node ``v`` is owned by shard ``owner(v) = v // n_local`` (contiguous
    range partition; callers balance ranges by edges beforehand).  For each
    shard ``s``:

    - ``export_idx [S, H]``: local row indices shard *s* must export — the
      union of rows *other* shards reference (own-shard references read the
      local vectors directly and never enter the exchange), padded with 0;
    - ``import_src [S, Nl, K+1] / import_row [S, Nl, K+1]``: for every
      neighborhood slot, either (source-shard, export-buffer-row) into the
      all-gathered export stack, or — where ``import_local [S, Nl, K+1]``
      is True — ``import_row`` holds the *local* row id instead.

    One ``all_gather`` of the ``[H, D]`` export buffer realizes the halo;
    gathers are then shard-local and static.  H is the true boundary size:
    a fully shard-local neighborhood table has H = 1 (padding only) and
    exchanges nothing useful.
    """

    export_idx: jax.Array  # [S, H] i32 local row ids to export
    import_src: jax.Array  # [S, Nl, K+1] i32 source shard of each slot
    import_row: jax.Array  # [S, Nl, K+1] i32 export-buf row | local row
    import_local: jax.Array  # [S, Nl, K+1] bool: slot is own-shard

    @property
    def halo_size(self) -> int:
        return self.export_idx.shape[1]


def build_halo_plan(
    neigh_global: np.ndarray,  # [N, K+1] global neighborhoods (self slot 0)
    n_shards: int,
) -> HaloPlan:
    """Build the exchange plan for one sampled neighborhood table."""
    n, k1 = neigh_global.shape
    assert n % n_shards == 0, "node count must split evenly across shards"
    n_local = n // n_shards
    owner = neigh_global // n_local  # [N, K+1]
    local_row = neigh_global % n_local
    dst_shard = (np.arange(n) // n_local)[:, None]  # owner of the *reader*
    is_local = owner == dst_shard

    # per source shard: union of rows exported to OTHER shards only
    export_sets: List[np.ndarray] = []
    for src in range(n_shards):
        need_mask = np.zeros(n_local, dtype=bool)
        for dst in range(n_shards):
            if dst == src:
                continue
            rows = local_row[dst * n_local : (dst + 1) * n_local]
            owners = owner[dst * n_local : (dst + 1) * n_local]
            need_mask[np.unique(rows[owners == src])] = True
        export_sets.append(np.nonzero(need_mask)[0])
    h = max(max((len(e) for e in export_sets), default=1), 1)
    export_idx = np.zeros((n_shards, h), dtype=np.int32)
    # map (shard, local_row) -> export buffer position
    pos_of = np.full((n_shards, n_local), -1, dtype=np.int32)
    for s, e in enumerate(export_sets):
        export_idx[s, : len(e)] = e
        pos_of[s, e] = np.arange(len(e), dtype=np.int32)

    import_src = owner.reshape(n_shards, n_local, k1).astype(np.int32)
    row_remote = pos_of[owner.reshape(-1), local_row.reshape(-1)].reshape(
        n_shards, n_local, k1
    )
    import_local = is_local.reshape(n_shards, n_local, k1)
    import_row = np.where(
        import_local, local_row.reshape(n_shards, n_local, k1), row_remote
    )
    assert (import_row >= 0).all(), "plan inconsistency: missing export row"
    return HaloPlan(
        export_idx=jnp.asarray(export_idx),
        import_src=jnp.asarray(import_src),
        import_row=jnp.asarray(import_row.astype(np.int32)),
        import_local=jnp.asarray(import_local),
    )


def halo_gather(
    local_vecs: jax.Array,  # [Nl, D] this shard's node vectors
    plan_export_idx: jax.Array,  # [S, H] (full plan table, replicated)
    plan_import_src: jax.Array,  # [Nl, K+1] (this shard's slice)
    plan_import_row: jax.Array,  # [Nl, K+1]
    plan_import_local: jax.Array,  # [Nl, K+1] bool
    axis_name: str = "data",
) -> jax.Array:
    """Inside ``shard_map``: returns ``[Nl, K+1, D]`` neighborhood vectors.
    Own-shard slots gather straight from ``local_vecs``; remote slots go
    through one export-buffer ``all_gather`` (the only collective)."""
    s = jax.lax.axis_index(axis_name)
    export = local_vecs[plan_export_idx[s]]  # [H, D]
    stack = jax.lax.all_gather(export, axis_name)  # [S, H, D]
    # clip the dual-use row index into each table's range before gathering
    h = stack.shape[1]
    remote = stack[
        plan_import_src, jnp.minimum(plan_import_row, h - 1)
    ]  # [Nl, K+1, D]
    local = local_vecs[
        jnp.minimum(plan_import_row, local_vecs.shape[0] - 1)
    ]
    return jnp.where(plan_import_local[..., None], local, remote)


# ------------------------------------------- overlapped exchange (regime 3)
@jax.tree_util.register_dataclass
@dataclasses.dataclass
class OverlapPlan:
    """Interior/boundary row split for exchange/compute overlap
    (SURVEY §7.1 step 6: "halo exchange … overlap with local neighborhood
    attention").

    A local row is **interior** when every slot of its sampled neighborhood
    is own-shard — its encoder work needs nothing from the exchange.  The
    overlapped layer issues the export-buffer ``all_gather`` first, encodes
    interior rows while the collective flies (XLA's async-collective
    scheduler hides it — the interior compute has no data dependency on the
    gathered stack), then encodes boundary rows from the landed stack.
    Both index sets are padded to cross-shard maxima with ``n_local``
    (out-of-range ⇒ dropped on the scatter back).
    """

    interior_rows: jax.Array  # [S, Ni] i32 local row ids, pad = n_local
    boundary_rows: jax.Array  # [S, Nb] i32 local row ids, pad = n_local

    @property
    def sizes(self) -> Tuple[int, int]:
        return self.interior_rows.shape[1], self.boundary_rows.shape[1]


def build_overlap_plan(plan: HaloPlan) -> OverlapPlan:
    """Split each shard's rows into interior/boundary from the halo plan's
    ``import_local`` table."""
    imp_loc = np.asarray(plan.import_local)  # [S, Nl, K+1]
    n_shards, n_local, _ = imp_loc.shape
    is_int = imp_loc.all(axis=-1)  # [S, Nl]
    ni = max(int(is_int.sum(axis=1).max()), 1)
    nb = max(int((~is_int).sum(axis=1).max()), 1)
    interior = np.full((n_shards, ni), n_local, dtype=np.int32)
    boundary = np.full((n_shards, nb), n_local, dtype=np.int32)
    for s in range(n_shards):
        r_int = np.nonzero(is_int[s])[0]
        r_bnd = np.nonzero(~is_int[s])[0]
        interior[s, : len(r_int)] = r_int
        boundary[s, : len(r_bnd)] = r_bnd
    return OverlapPlan(
        interior_rows=jnp.asarray(interior),
        boundary_rows=jnp.asarray(boundary),
    )


def interior_fraction(plan: HaloPlan) -> float:
    """Mean fraction of rows whose whole neighborhood is own-shard — the
    compute available to hide the exchange under."""
    return float(np.asarray(plan.import_local).all(axis=-1).mean())


def halo_encode_overlapped(
    encode_fn: Callable[..., jax.Array],  # ([R, K+1, D], tag) -> [R, D]
    local_vecs: jax.Array,  # [Nl, D]
    plan_export_idx: jax.Array,  # [S, H] full table (replicated)
    plan_import_src: jax.Array,  # [Nl, K+1] this shard's slice
    plan_import_row: jax.Array,  # [Nl, K+1]
    plan_import_local: jax.Array,  # [Nl, K+1] bool
    interior_rows: jax.Array,  # [Ni] this shard's slice
    boundary_rows: jax.Array,  # [Nb]
    axis_name: str = "data",
) -> jax.Array:
    """One overlapped halo layer inside ``shard_map``: start the export
    ``all_gather``, encode interior rows (independent of the collective, so
    the scheduler overlaps them), then boundary rows from the landed stack,
    and scatter both back into ``[Nl, D]`` row order.

    Row-for-row the math is identical to ``halo_gather`` + a whole-shard
    encode — the encoder is row-independent (per-row LayerNorm, attention
    within the row's K+1 slots, per-row FFN), so splitting the row set
    changes nothing semantically; XLA's shape-dependent vectorization of
    the row-internal reductions leaves ~1e-7 float noise
    (``tests/test_edge_partition.py`` pins both schedules to agree to
    that precision)."""
    s = jax.lax.axis_index(axis_name)
    n_local = local_vecs.shape[0]
    export = local_vecs[plan_export_idx[s]]  # [H, D]
    stack = jax.lax.all_gather(export, axis_name)  # async-start

    # interior: every slot is a local row id (import_local all True)
    ir = jnp.minimum(interior_rows, n_local - 1)
    int_neigh = local_vecs[
        jnp.minimum(plan_import_row[ir], n_local - 1)
    ]  # [Ni, K+1, D]
    int_out = encode_fn(int_neigh, 0)  # overlaps the all_gather

    # boundary: mixed local/remote slots, needs the landed stack
    br = jnp.minimum(boundary_rows, n_local - 1)
    b_src = plan_import_src[br]
    b_row = plan_import_row[br]
    b_loc = plan_import_local[br]
    h = stack.shape[1]
    remote = stack[b_src, jnp.minimum(b_row, h - 1)]
    local = local_vecs[jnp.minimum(b_row, n_local - 1)]
    bnd_out = encode_fn(jnp.where(b_loc[..., None], local, remote), 1)

    out = jnp.zeros((n_local, int_out.shape[-1]), int_out.dtype)
    out = out.at[interior_rows].set(int_out, mode="drop")
    out = out.at[boundary_rows].set(bnd_out, mode="drop")
    return out


# ------------------------------------------------- regime-2 full train step
@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HaloUnsupParams:
    """Parameters of the node-partitioned unsupervised U2GNN: k encoder
    stacks + the sampled-softmax output-embedding table (replicated)."""

    encoders: Tuple  # k × TransformerEncoderParams
    ss: Any  # SampledSoftmaxParams [total_nodes, D]


def init_halo_unsup_params(
    key: jax.Array,
    num_layers: int,
    feature_dim: int,
    ff_hidden: int,
    total_nodes: int,
    num_timesteps: int = 1,
) -> HaloUnsupParams:
    from graph_transformer_tpu.ops.attention import init_encoder_params
    from graph_transformer_tpu.ops.sampled_softmax import (
        init_sampled_softmax_params,
    )

    encoders = tuple(
        init_encoder_params(
            jax.random.fold_in(key, i), num_timesteps, feature_dim, ff_hidden
        )
        for i in range(num_layers)
    )
    ss = init_sampled_softmax_params(
        jax.random.fold_in(key, 999), total_nodes, feature_dim
    )
    return HaloUnsupParams(encoders=encoders, ss=ss)


def halo_unsup_forward_local(
    params: HaloUnsupParams,
    x_local: jax.Array,  # [Nl, D] this shard's node features
    plan_export_idx: jax.Array,  # [S, H] full table (replicated)
    plan_import_src: jax.Array,  # [Nl, K+1] this shard's slice
    plan_import_row: jax.Array,  # [Nl, K+1]
    plan_import_local: jax.Array,  # [Nl, K+1] bool
    num_timesteps: int,
    rng: Optional[jax.Array] = None,
    axis_name: str = "data",
    interior_rows: Optional[jax.Array] = None,  # [Ni] overlap split
    boundary_rows: Optional[jax.Array] = None,  # [Nb]
) -> jax.Array:
    """Shard-local node-partitioned U2GNN encoder forward: per layer, one
    halo exchange (``all_gather`` of the export buffer) re-gathers the
    current node vectors into [Nl, K+1, D] neighborhoods, then the
    neighborhood attention runs purely locally.  This is the transductive
    REDDIT-scale regime the reference could never reach (single device,
    ``train_pytorch_U2GNN_UnSup.py``); neighborhoods stay fixed within the
    step so one :class:`HaloPlan` serves every layer.

    With ``interior_rows``/``boundary_rows`` (an :class:`OverlapPlan`
    shard slice) each layer runs the overlapped schedule instead: export
    ``all_gather`` in flight while interior rows encode, then boundary
    rows — double-buffered across layers (layer t's boundary encode and
    layer t+1's exchange pipeline back-to-back).

    Must run inside ``shard_map`` over ``axis_name``.  Returns updated self
    vectors [Nl, D].
    """
    from graph_transformer_tpu.ops.attention import neighborhood_encoder

    h = x_local
    for i, enc in enumerate(params.encoders):
        if rng is not None:
            rng, r_enc = jax.random.split(rng)
        else:
            r_enc = None

        if interior_rows is not None:
            def encode_part(nv, tag, _enc=enc, _r=r_enc):
                r = None if _r is None else jax.random.fold_in(_r, tag)
                return neighborhood_encoder(
                    _enc, nv, dropout_rate=0.5, rng=r,
                    num_timesteps=num_timesteps,
                )

            h = halo_encode_overlapped(
                encode_part,
                h, plan_export_idx, plan_import_src, plan_import_row,
                plan_import_local, interior_rows, boundary_rows, axis_name,
            )
            continue
        neigh_vecs = halo_gather(
            h, plan_export_idx, plan_import_src, plan_import_row,
            plan_import_local, axis_name,
        )  # [Nl, K+1, D]
        h = neighborhood_encoder(
            enc,
            neigh_vecs,
            dropout_rate=0.5,
            rng=r_enc,
            num_timesteps=num_timesteps,
        )
    return h


def make_halo_train_step(
    opt,
    mesh: Mesh,
    total_nodes: int,
    nsampled: int,
    num_timesteps: int = 1,
    axis_name: str = "data",
    donate: bool = True,
    deterministic: bool = False,
    overlap: bool = False,
    masked: bool = False,
):
    """Regime-2 FULL training step: node-partitioned U2GNN encoder with
    per-layer halo exchange + sampled-softmax objective + gradient ``psum``.

    Input layout: ``x`` [N, D] node features range-partitioned over
    ``axis_name`` (shard s owns rows ``s·Nl .. (s+1)·Nl``), ``plan`` a
    :class:`HaloPlan` for the step's sampled neighborhoods, params
    replicated.  Each shard computes the sampled-softmax loss of its own
    nodes (labels = their global ids, one shared candidate draw — matching
    the single-device semantics where one candidate set serves the whole
    batch, ``model_U2GNN_Unsup_multi.py:51-58``), then grads/losses
    ``psum`` over ICI.  Only the [H, D] export buffers ever cross chips.

    With ``overlap=True`` (regime 3) the returned step takes
    ``(params, opt_state, x, plan, oplan, valid, key)``: each layer runs
    the interior/boundary overlapped schedule of
    :func:`halo_encode_overlapped`, and ``valid`` ([N] float, range-
    partitioned like ``x``) masks the per-node losses — the padding rows an
    edge-balanced :class:`NodeRangePartition` introduces must not train.
    """
    from jax import shard_map

    from graph_transformer_tpu.ops.sampled_softmax import sampled_softmax_loss
    from graph_transformer_tpu.sampling.log_uniform import LogUniformSpec

    spec = LogUniformSpec.create(total_nodes, nsampled)
    n_shards = mesh.shape[axis_name]
    assert total_nodes % n_shards == 0
    n_local = total_nodes // n_shards

    def _grad_local(p, x_local, export_idx, imp_src, imp_row, imp_loc, k,
                    int_rows=None, bnd_rows=None, valid=None):
        s = jax.lax.axis_index(axis_name)
        k_cand, k_drop = jax.random.split(k)
        # dropout differs per shard; the candidate draw is shared
        k_drop = None if deterministic else jax.random.fold_in(k_drop, s)
        labels = s * n_local + jnp.arange(n_local, dtype=jnp.int32)

        def loss_fn(pp):
            h = halo_unsup_forward_local(
                pp, x_local, export_idx, imp_src, imp_row, imp_loc,
                num_timesteps, rng=k_drop, axis_name=axis_name,
                interior_rows=int_rows, boundary_rows=bnd_rows,
            )
            losses = sampled_softmax_loss(pp.ss, k_cand, h, labels, spec)
            if valid is not None:
                losses = losses * valid
            return jnp.sum(losses)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        return (
            jax.lax.psum(loss, axis_name),
            jax.lax.psum(grads, axis_name),
        )

    def step(params, opt_state, x, plan: HaloPlan, key):
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P(),
                P(axis_name),
                P(),
                P(axis_name),
                P(axis_name),
                P(axis_name),
                P(),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )
        def grad_local(p, x_local, export_idx, imp_src, imp_row, imp_loc, k):
            return _grad_local(
                p, x_local, export_idx, imp_src[0], imp_row[0], imp_loc[0], k
            )

        loss, grads = grad_local(
            params, x, plan.export_idx, plan.import_src, plan.import_row,
            plan.import_local, key,
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    def step_overlap(params, opt_state, x, plan: HaloPlan,
                     oplan: OverlapPlan, valid, key):
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P(),
                P(axis_name),
                P(),
                P(axis_name),
                P(axis_name),
                P(axis_name),
                P(axis_name),
                P(axis_name),
                P(axis_name),
                P(),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )
        def grad_local(p, x_local, export_idx, imp_src, imp_row, imp_loc,
                       int_rows, bnd_rows, v, k):
            return _grad_local(
                p, x_local, export_idx, imp_src[0], imp_row[0], imp_loc[0],
                k, int_rows=int_rows[0], bnd_rows=bnd_rows[0], valid=v,
            )

        loss, grads = grad_local(
            params, x, plan.export_idx, plan.import_src, plan.import_row,
            plan.import_local, oplan.interior_rows, oplan.boundary_rows,
            valid, key,
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    def step_masked(params, opt_state, x, plan: HaloPlan, valid, key):
        """Blocking exchange + per-node loss mask: the parity twin of the
        overlapped step on padded partitions (``masked=True``)."""
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(
                P(),
                P(axis_name),
                P(),
                P(axis_name),
                P(axis_name),
                P(axis_name),
                P(axis_name),
                P(),
            ),
            out_specs=(P(), P()),
            check_vma=False,
        )
        def grad_local(p, x_local, export_idx, imp_src, imp_row, imp_loc,
                       v, k):
            return _grad_local(
                p, x_local, export_idx, imp_src[0], imp_row[0], imp_loc[0],
                k, valid=v,
            )

        loss, grads = grad_local(
            params, x, plan.export_idx, plan.import_src, plan.import_row,
            plan.import_local, valid, key,
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    fn = step_overlap if overlap else (step_masked if masked else step)
    return jax.jit(fn, donate_argnums=(0, 1) if donate else ())


# ---------------------------------------------------- analytic scaling model
def halo_cost_model(
    plan: HaloPlan,
    n_local: int,
    feature_dim: int,
    num_layers: int,
    ff_hidden: int,
    num_timesteps: int = 1,
    bytes_per_elt: int = 2,
    ici_bytes_per_s: float = 4.5e10,
    flops_per_s: float = 1.97e14,
    valid_fraction: float = 1.0,
) -> dict:
    """Hardware-independent scaling prediction for the halo regime
    (VERDICT weak-item 6): per-step collective bytes vs local compute.

    Per U2GNN layer each shard all_gathers the [H, D] export buffers of all
    S shards (one bidirectional ring pass over ICI moves (S-1)/S of S·H·D
    elements per link), while local compute is the neighborhood encoder over
    [n_local·(K+1), D] rows.  Efficiency at S shards ≈
    t_compute / (t_compute + t_collective) assuming no overlap — the
    regime-2 blocking schedule's lower bound.

    ``predicted_efficiency_overlap`` models regime 3
    (:func:`halo_encode_overlapped`): per layer the exchange hides under
    the *interior* rows' encoder work, so the layer costs
    ``max(t_coll_layer, f_int·t_comp_layer) + (1-f_int)·t_comp_layer``
    where ``f_int`` is the fraction of rows with fully-local neighborhoods
    (read off the plan).  When interior compute covers the exchange the
    predicted efficiency returns to ~1.

    ``valid_fraction`` (real nodes / padded slots, from a
    :class:`NodeRangePartition`) scales both efficiencies: padding rows
    burn compute that can hide collectives but does no useful work, so a
    model that counted them as useful would flatter unbalanced partitions.

    Defaults: v5e ICI ~45 GB/s/link usable, 197 TFLOP/s bf16.
    Returns bytes, FLOPs, times and the predicted efficiencies.
    """
    S, H = plan.export_idx.shape
    k1 = plan.import_src.shape[-1]
    d = feature_dim
    # ring all_gather: each link carries (S-1)·H·D elements per exchange
    coll_bytes = (S - 1) * H * d * bytes_per_elt * num_layers * 1  # per step
    rows = n_local * k1
    # encoder FLOPs per layer (attention ~ rows·k1·d + ffn rows·d·ff, ×T)
    enc_flops = (
        (2 * rows * d * 3 * d + 2 * rows * k1 * d * 2 + 2 * rows * d * d)
        + 2 * (2 * rows * d * ff_hidden)
    ) * num_timesteps
    flops = enc_flops * num_layers * 3  # fwd + ~2x bwd
    t_comp = flops / flops_per_s
    t_coll = coll_bytes / ici_bytes_per_s

    f_int = interior_fraction(plan)
    t_comp_layer = t_comp / num_layers
    t_coll_layer = t_coll / num_layers
    t_layer_ov = (
        max(t_coll_layer, f_int * t_comp_layer)
        + (1.0 - f_int) * t_comp_layer
    )
    eff_overlap = t_comp / (num_layers * t_layer_ov)
    return {
        "shards": int(S),
        "halo_rows_per_shard": int(H),
        "collective_bytes_per_step": int(coll_bytes),
        "local_flops_per_step": int(flops),
        "t_compute_s": t_comp,
        "t_collective_s": t_coll,
        "interior_fraction": f_int,
        "valid_fraction": valid_fraction,
        "predicted_efficiency": valid_fraction * t_comp / (t_comp + t_coll),
        "predicted_efficiency_overlap": valid_fraction * eff_overlap,
    }
