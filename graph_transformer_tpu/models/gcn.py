"""GCN encoder baseline on the shared sparse substrate.

Capability parity with ``U2GNN_pytorch/gcn_pytorch.py`` + ``layers.py:16-49``:
a VGAE-style 2-layer GCN encoder (shared first layer, mu/sigma heads) whose
aggregation ``spmm(adj, X @ W) + b`` becomes a segment-sum SpMM over the
padded edge list with symmetric Kipf normalization.  The wrapper dispatches
the same three losses as the U2GNN unsup model
(``gcn_pytorch.py:64-75``).
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
from graph_transformer_tpu.ops.sparse import gcn_norm_edges, spmm
from graph_transformer_tpu.sampling.log_uniform import LogUniformSpec


def _glorot(key, shape):
    bound = math.sqrt(6.0 / (shape[0] + shape[1]))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GCNLayerParams:
    w: jax.Array  # [in, out]
    b: jax.Array  # [out]


def _init_gcn_layer(key, din, dout) -> GCNLayerParams:
    return GCNLayerParams(w=_glorot(key, (din, dout)), b=jnp.zeros((dout,)))


def gcn_layer(
    p: GCNLayerParams,
    x: jax.Array,
    edge_src: jax.Array,
    edge_dst: jax.Array,
    edge_val: jax.Array,
    num_nodes: int,
) -> jax.Array:
    """A_hat @ (X W) + b (``layers.py:38-44``)."""
    return spmm(edge_src, edge_dst, edge_val, x @ p.w, num_nodes) + p.b


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GCNParams:
    gc1: GCNLayerParams
    gc2_mu: GCNLayerParams
    gc2_sig: GCNLayerParams
    ss: SampledSoftmaxParams


@dataclasses.dataclass(frozen=True)
class GCNModel:
    """VGAE-style GCN encoder + unsup loss heads (``gcn_pytorch.py``)."""

    feature_dim: int
    vocab_size: int
    cfg: ModelConfig
    latent_dim: int = 2  # reference hardcodes 2 (gcn_pytorch.py:56)

    def spec(self) -> LogUniformSpec:
        return LogUniformSpec.create(self.vocab_size, self.cfg.sampled_num)

    def init(self, key: jax.Array) -> GCNParams:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        H = self.cfg.ff_hidden_size
        return GCNParams(
            gc1=_init_gcn_layer(k1, self.feature_dim, H),
            gc2_mu=_init_gcn_layer(k2, H, self.latent_dim),
            gc2_sig=_init_gcn_layer(k3, H, self.latent_dim),
            ss=init_sampled_softmax_params(k4, self.vocab_size, self.latent_dim),
        )

    def encode(
        self,
        params: GCNParams,
        batch: GraphBatch,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """(mu, sigma) — shared first layer, relu, dropout, two heads
        (``gcn_pytorch.py:29-35``)."""
        n = batch.n_pad
        src, dst, val = gcn_norm_edges(
            batch.edge_src, batch.edge_dst, batch.edge_mask, n
        )
        h = jax.nn.relu(gcn_layer(params.gc1, batch.x, src, dst, val, n))
        if rng is not None:
            h = _dropout(h, self.cfg.dropout, rng)
        mu = gcn_layer(params.gc2_mu, h, src, dst, val, n)
        log_sig = gcn_layer(params.gc2_sig, h, src, dst, val, n)
        return mu, jnp.exp(log_sig)

    def loss(
        self,
        params: GCNParams,
        batch: GraphBatch,
        key: jax.Array,
        spec: LogUniformSpec,
        rng: Optional[jax.Array] = None,
        adj_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        z, _ = self.encode(params, batch, rng=rng)
        if self.cfg.loss_type == "default":
            per_node = sampled_softmax_loss(
                params.ss,
                key,
                z,
                batch.node_gidx,
                spec,
                mode=self.cfg.sampled_softmax_mode,
                mask=batch.node_mask,
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
