"""Unsupervised GCN baseline for graph classification.

Capability parity with the reference's TF1 baseline (``gcn_baseline/``):
k Kipf GraphConvolution layers on the block-diagonal batch adjacency with
self-loops and symmetric normalization (``gcn_baseline/train_unsup_gcn.py:
53-72``, ``gcn_layer.py:106-155``), the per-layer outputs **concatenated**
and fed to a sampled softmax over the node vocabulary
(``model_unsup_gcn.py:40-49``); evaluation reads the output-embedding matrix,
sum-pools to graph level, and fits 10-fold logistic regression
(``train_unsup_gcn.py:180-201``).

Runs on the shared sparse substrate (segment-sum SpMM) and the pure-JAX
sampled softmax — same trainer interface as :class:`U2GNNUnsup`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from graph_transformer_tpu.config import ModelConfig
from graph_transformer_tpu.data.batching import GraphBatch
from graph_transformer_tpu.models.gcn import GCNLayerParams, _init_gcn_layer, gcn_layer
from graph_transformer_tpu.ops.attention import _dropout
from graph_transformer_tpu.ops.sampled_softmax import (
    SampledSoftmaxParams,
    init_sampled_softmax_params,
    sampled_softmax_loss,
)
from graph_transformer_tpu.ops.sparse import gcn_norm_edges
from graph_transformer_tpu.sampling.log_uniform import LogUniformSpec


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GCNGraphUnsupParams:
    layers: Tuple[GCNLayerParams, ...]
    ss: SampledSoftmaxParams  # [V, k·H] output embeddings


@dataclasses.dataclass(frozen=True)
class GCNGraphUnsup:
    feature_dim: int
    vocab_size: int
    cfg: ModelConfig  # num_hidden_layers = k GCN layers, ff_hidden_size = H

    @property
    def embedding_dim(self) -> int:
        return self.cfg.num_hidden_layers * self.cfg.ff_hidden_size

    def spec(self) -> LogUniformSpec:
        return LogUniformSpec.create(self.vocab_size, self.cfg.sampled_num)

    def init(self, key: jax.Array) -> GCNGraphUnsupParams:
        k = self.cfg.num_hidden_layers
        h = self.cfg.ff_hidden_size
        dims = [self.feature_dim] + [h] * k
        layers = tuple(
            _init_gcn_layer(jax.random.fold_in(key, i), dims[i], dims[i + 1])
            for i in range(k)
        )
        ss = init_sampled_softmax_params(
            jax.random.fold_in(key, 999), self.vocab_size, self.embedding_dim
        )
        return GCNGraphUnsupParams(layers=layers, ss=ss)

    def encode(
        self,
        params: GCNGraphUnsupParams,
        batch: GraphBatch,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """[N_pad, k·H]: ReLU GCN layer outputs concatenated
        (``model_unsup_gcn.py:27-44``; dropout on inputs of each layer,
        ``gcn_layer.py:139-146``)."""
        n = batch.n_pad
        src, dst, val = gcn_norm_edges(
            batch.edge_src, batch.edge_dst, batch.edge_mask, n
        )
        h = batch.x
        outs = []
        for i, layer in enumerate(params.layers):
            if rng is not None:
                rng, sub = jax.random.split(rng)
                h = _dropout(h, self.cfg.dropout, sub)
            h = jax.nn.relu(gcn_layer(layer, h, src, dst, val, n))
            outs.append(h)
        return jnp.concatenate(outs, axis=-1)

    def loss(
        self,
        params: GCNGraphUnsupParams,
        batch: GraphBatch,
        key: jax.Array,
        spec: LogUniformSpec,
        rng: Optional[jax.Array] = None,
        adj_mask=None,  # unused; trainer-interface compatibility
        csr=None,  # unused; trainer-interface compatibility
        neigh_feat=None,  # unused; GCN aggregates over edges, not fanouts
        neigh_global=None,  # unused; trainer-interface compatibility
        num_total_nodes=None,  # unused; trainer-interface compatibility
        vocab_perm: Optional[jax.Array] = None,  # id-symmetric protocol
        sampled_inputs=None,  # unused; trainer-interface compatibility
    ) -> jax.Array:
        z = self.encode(params, batch, rng=rng)
        labels = batch.node_gidx
        if vocab_perm is not None:
            labels = vocab_perm[labels]
        per_node = sampled_softmax_loss(
            params.ss,
            key,
            z,
            labels,
            spec,
            mode=self.cfg.sampled_softmax_mode,
            mask=batch.node_mask,
        )
        return jnp.sum(per_node)

    def node_embeddings(
        self, params: GCNGraphUnsupParams,
        vocab_perm: Optional[jax.Array] = None,
    ) -> jax.Array:
        """The learned output-embedding matrix W — what the reference
        evaluates (``train_unsup_gcn.py:180-186`` reads
        ``embedding/node_embeddings:0``).  Under the id-symmetric protocol
        node v trained row ``vocab_perm[v]``; return rows in node order."""
        if vocab_perm is not None:
            return params.ss.weight[vocab_perm]
        return params.ss.weight
