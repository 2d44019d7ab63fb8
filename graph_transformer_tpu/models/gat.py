"""GAT encoder baseline — sparse rebuild of the reference's dense attention.

The reference GATConv scatters per-edge leaky-ReLU scores into a dense
``N×N`` matrix filled with ``-1e20`` and row-softmaxes it
(``layers.py:74-92``) — O(N²) memory.  Here the same math runs sparsely:
SDDMM-style per-edge scores → per-destination ``edge_softmax`` → segment-sum
aggregation, all static-shape over the padded edge list.

Encoder/wrapper structure mirrors the GCN baseline (``gat_pytorch.py``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from graph_transformer_tpu.config import ModelConfig
from graph_transformer_tpu.data.batching import GraphBatch
from graph_transformer_tpu.ops.attention import _dropout
from graph_transformer_tpu.ops.losses import gae_loss, supcon_loss
from graph_transformer_tpu.ops.sampled_softmax import (
    SampledSoftmaxParams,
    init_sampled_softmax_params,
    sampled_softmax_loss,
)
from graph_transformer_tpu.ops.sparse import edge_softmax
from graph_transformer_tpu.sampling.log_uniform import LogUniformSpec


def _xavier_gain(key, shape, gain=1.414):
    # torch xavier_uniform_ with gain (layers.py:68-72)
    bound = gain * math.sqrt(6.0 / (shape[0] + shape[1]))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GATLayerParams:
    w: jax.Array  # [in, out]
    a: jax.Array  # [2*out] attention vector (reference shape (2F, 1))
    b: jax.Array  # [out]


def _init_gat_layer(key, din, dout) -> GATLayerParams:
    k1, k2 = jax.random.split(key)
    return GATLayerParams(
        w=_xavier_gain(k1, (din, dout)),
        a=_xavier_gain(k2, (2 * dout, 1))[:, 0],
        b=jnp.zeros((dout,)),
    )


def gat_layer(
    p: GATLayerParams,
    x: jax.Array,  # [N, din]
    edge_src: jax.Array,
    edge_dst: jax.Array,
    edge_mask: jax.Array,
    num_nodes: int,
    alpha: float = 0.2,
    dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """One GAT convolution (semantics of ``layers.py:74-92``).

    Note the reference's row-major convention: the softmax normalizes over
    ``attention[source, :]`` rows, i.e. over the outgoing edges of ``source``
    — reproduced here by normalizing per *source* segment and aggregating
    messages from ``target`` into ``source``.
    """
    if rng is not None:
        rng, r1, r2, r3 = jax.random.split(rng, 4)
        x = _dropout(x, dropout, r1)
    h = x @ p.w  # [N, dout]
    dout = h.shape[-1]
    # e_ij = leaky_relu([h_i || h_j] · a) for edge (i=src, j=dst)
    e = h[edge_src] @ p.a[:dout] + h[edge_dst] @ p.a[dout:]
    e = jax.nn.leaky_relu(e, negative_slope=alpha)
    # softmax over each source row (reference attention[source, target] = e)
    att = edge_softmax(e, edge_src, edge_mask, num_nodes)
    if rng is not None:
        att = _dropout(att, dropout, r2)
        h = _dropout(h, dropout, r3)
    msg = att[:, None] * h[edge_dst]
    out = jax.ops.segment_sum(msg, edge_src, num_segments=num_nodes)
    return out + p.b


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GATParams:
    gc1: GATLayerParams
    gc2_mu: GATLayerParams
    gc2_sig: GATLayerParams
    ss: SampledSoftmaxParams


@dataclasses.dataclass(frozen=True)
class GATModel:
    feature_dim: int
    vocab_size: int
    cfg: ModelConfig
    latent_dim: int = 2
    alpha: float = 0.2  # leaky-ReLU slope (gat_pytorch.py:24)

    def spec(self) -> LogUniformSpec:
        return LogUniformSpec.create(self.vocab_size, self.cfg.sampled_num)

    def init(self, key: jax.Array) -> GATParams:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        H = self.cfg.ff_hidden_size
        return GATParams(
            gc1=_init_gat_layer(k1, self.feature_dim, H),
            gc2_mu=_init_gat_layer(k2, H, self.latent_dim),
            gc2_sig=_init_gat_layer(k3, H, self.latent_dim),
            ss=init_sampled_softmax_params(k4, self.vocab_size, self.latent_dim),
        )

    def encode(
        self,
        params: GATParams,
        batch: GraphBatch,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        n = batch.n_pad
        dr = self.cfg.dropout

        def split(r):
            if r is None:
                return None, None
            return jax.random.split(r)

        rng, r1 = split(rng)
        h = jax.nn.relu(
            gat_layer(
                params.gc1, batch.x, batch.edge_src, batch.edge_dst,
                batch.edge_mask, n, self.alpha, dr, r1,
            )
        )
        rng, r2 = split(rng)
        if r2 is not None:
            h = _dropout(h, dr, r2)
        rng, r3 = split(rng)
        mu = gat_layer(
            params.gc2_mu, h, batch.edge_src, batch.edge_dst,
            batch.edge_mask, n, self.alpha, dr, r3,
        )
        rng, r4 = split(rng)
        log_sig = gat_layer(
            params.gc2_sig, h, batch.edge_src, batch.edge_dst,
            batch.edge_mask, n, self.alpha, dr, r4,
        )
        return mu, jnp.exp(log_sig)

    def loss(
        self,
        params: GATParams,
        batch: GraphBatch,
        key: jax.Array,
        spec: LogUniformSpec,
        rng: Optional[jax.Array] = None,
        adj_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        z, _ = self.encode(params, batch, rng=rng)
        if self.cfg.loss_type == "default":
            per_node = sampled_softmax_loss(
                params.ss, key, z, batch.node_gidx, spec,
                mode=self.cfg.sampled_softmax_mode, mask=batch.node_mask,
            )
            return jnp.sum(per_node)
        if self.cfg.loss_type == "contrastive":
            return supcon_loss(z, mask=adj_mask, valid=batch.node_mask)
        if self.cfg.loss_type == "gae":
            n_real = jnp.sum(batch.node_mask)
            n_pos = jnp.sum(adj_mask)
            norm = (n_real * n_real) / jnp.maximum(
                2.0 * (n_real * n_real - n_pos), 1.0
            )
            return gae_loss([z], adj_mask[:, :, None], norm)
        raise ValueError(f"unknown loss_type {self.cfg.loss_type!r}")
