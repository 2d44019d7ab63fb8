"""On-device padded-batch assembly.

The host batch builder (``data/batching.py``) replaces the reference's
per-step Python dict building, but for scan-everything training loops even
vectorized numpy per step is the bottleneck: a full 10-fold × 50-epoch CV
builds ~45k batches on a 2-core host while the chip idles.  Graphs are
stored as contiguous global-node ranges (``GraphDataset.graph_offsets``), so
a padded batch is a *ragged gather*: given ``B`` graph ids, every batch
array is computable with cumsum/searchsorted + gathers — all static-shape,
all inside the jitted program.  The host's only remaining per-run work is
uploading the dataset arrays once.

Produces exactly the host builder's layout (``BatchBuilder.build``): nodes
of the selected graphs concatenated in order, padded to ``n_pad``; padding
rows carry ``graph_id == B`` (dropped by segment_sum), ``node_gidx == 0``,
``mask == 0``.  Neighborhoods are *not* sampled here — training steps call
:func:`~graph_transformer_tpu.sampling.neighbors.resample_batch_neighbors`
on the assembled batch (fresh fanout every step), matching the train path.
Edge arrays are a 1-element stub: the U2GNN models never read them (edges
feed GCN/GAT, whose trainers use the host builder).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from graph_transformer_tpu.data.batching import GraphBatch
from graph_transformer_tpu.data.tu import GraphDataset


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceDataset:
    """The dataset arrays a batch gather needs, in device memory."""

    x: jax.Array  # [N, D] f32 node features
    graph_offsets: jax.Array  # [G+1] i32
    labels: jax.Array  # [G] i32

    @staticmethod
    def from_dataset(ds: GraphDataset) -> "DeviceDataset":
        return DeviceDataset(
            x=jnp.asarray(ds.node_feat, jnp.float32),
            graph_offsets=jnp.asarray(ds.graph_offsets, jnp.int32),
            labels=jnp.asarray(ds.labels, jnp.int32),
        )


def assemble_batch(dd: DeviceDataset, gids: jax.Array, n_pad: int) -> GraphBatch:
    """Gather a padded :class:`GraphBatch` for ``gids`` [B] on device.

    ``n_pad`` must bound the total node count of any B-graph batch — the
    host picks it as the padded sum of the B largest graphs
    (``BatchBuilder.__init__``), which this function reuses.
    """
    B = gids.shape[0]
    gids = gids.astype(jnp.int32)
    off = dd.graph_offsets
    starts = off[gids]  # [B] global node start per selected graph
    sizes = off[gids + 1] - starts  # [B]
    cum = jnp.cumsum(sizes)  # [B]
    total = cum[-1]

    slot = jnp.arange(n_pad, dtype=jnp.int32)
    # graph slot owning each batch row: first g with cum[g] > slot
    seg = jnp.searchsorted(cum, slot, side="right").astype(jnp.int32)
    seg_c = jnp.minimum(seg, B - 1)
    within = slot - (cum[seg_c] - sizes[seg_c])
    gidx = starts[seg_c] + within  # [n_pad] global node ids
    mask = (slot < total).astype(jnp.float32)
    gidx = jnp.where(mask > 0, gidx, 0).astype(jnp.int32)

    x = dd.x[gidx] * mask[:, None]
    graph_id = jnp.where(mask > 0, seg_c, B).astype(jnp.int32)
    self_neigh = jnp.broadcast_to(slot[:, None], (n_pad, 1))

    stub = jnp.zeros((1,), jnp.int32)
    return GraphBatch(
        x=x,
        neigh=self_neigh,  # placeholder; train steps resample on device
        graph_id=graph_id,
        node_gidx=gidx,
        node_mask=mask,
        edge_src=stub,
        edge_dst=stub,
        edge_mask=stub.astype(jnp.float32),
        labels=dd.labels[gids],
    )
