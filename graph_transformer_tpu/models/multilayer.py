"""Multilayer (multiplex-graph) siamese/multi U2GNN.

Capability parity with ``U2GNN_pytorch/python_multi_layer_siamese_u2gnn.py``:
one U2GNN encoder shared across the S multiplex graph layers (``siamese``) or
one per layer (``multi``) (`:27,39-42,71-84`); the per-layer node embeddings
are stacked and mixed by a cross-layer MultiheadAttention (`:86-89`), the last
slot is kept, optionally projected through a leaky-ReLU head (`:34-36,90-91`),
and the trainable global node-embedding table ``weight`` ([V, D], xavier,
`:45-48`) carries the loss: Σ_layers SupCon(weight, adj_layer) or stacked GAE
BCE (``loss_functions.py:34-49``).

The multiplex axis S is a *model* axis (multi-view graphs), not a parallelism
axis; each view is encoded with the same static-shape neighborhood-attention
program, so on TPU the S views batch cleanly (we fold S into the node axis for
the siamese case — one big encoder call instead of an S-step Python loop).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from graph_transformer_tpu.config import ModelConfig
from graph_transformer_tpu.ops.attention import (
    MHAParams,
    TransformerEncoderParams,
    init_encoder_params,
    init_mha_params,
    multihead_attention,
    neighborhood_encoder,
    _xavier,
)
from graph_transformer_tpu.ops.losses import gae_loss, supcon_loss


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MultiplexBatch:
    """A transductive multiplex-node batch: one shared node set, S graph views.

    ``neigh`` is the stacked per-view neighborhoods ``[S, N, K+1]`` (the
    reference's ``input_x[n, K+1, S]``, ``ml_node_train_utils.py:199-206``,
    transposed view-major so each view is contiguous); ``x`` carries per-view
    features ``[S, N, D]`` (the reference's ``X[n, d, S]``); ``adj`` is the
    dense per-view adjacency stack ``[N, N, S]`` used as the contrastive mask
    / GAE target.
    """

    x: jax.Array  # [S, N, D] per-view node features
    neigh: jax.Array  # [S, N, K+1] i32 per-view neighborhoods, slot 0 = self
    adj: jax.Array  # [N, N, S] f32 per-view adjacency (loss mask/target)
    node_mask: jax.Array  # [N] f32

    @property
    def num_views(self) -> int:
        return self.neigh.shape[0]

    @property
    def num_nodes(self) -> int:
        return self.x.shape[1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MultilayerParams:
    encoders: Tuple[TransformerEncoderParams, ...]  # 1 (siamese) or S (multi)
    cross_attn: MHAParams
    weight: jax.Array  # [V, D] global node-embedding table (the output)
    proj_w: Optional[jax.Array]  # [D, P] optional projection head
    proj_b: Optional[jax.Array]  # [P]


@dataclasses.dataclass(frozen=True)
class MultilayerU2GNN:
    """Siamese/multi U2GNN over multiplex graphs
    (``python_multi_layer_siamese_u2gnn.py``)."""

    feature_dim: int
    num_nodes: int  # transductive: vocab == node count
    num_views: int
    cfg: ModelConfig

    @property
    def siamese(self) -> bool:
        return self.cfg.ml_model_type == "siamese"

    def init(self, key: jax.Array) -> MultilayerParams:
        cfg = self.cfg
        D = self.feature_dim
        stored = 1 if cfg.share_timestep_weights else cfg.num_timesteps
        n_enc = 1 if self.siamese else self.num_views
        encoders = tuple(
            init_encoder_params(
                jax.random.fold_in(key, i), stored, D, cfg.ff_hidden_size
            )
            for i in range(n_enc)
        )
        cross_attn = init_mha_params(jax.random.fold_in(key, 500), D)
        # xavier-normal node embedding (python_multi_layer_siamese_u2gnn.py:45-48)
        std = math.sqrt(2.0 / (self.num_nodes + D))
        weight = std * jax.random.normal(
            jax.random.fold_in(key, 501), (self.num_nodes, D), jnp.float32
        )
        proj_w = proj_b = None
        if cfg.projection_dim > 0:
            proj_w = _xavier(
                jax.random.fold_in(key, 502), (D, cfg.projection_dim)
            )
            proj_b = jnp.zeros((cfg.projection_dim,), jnp.float32)
        return MultilayerParams(
            encoders=encoders,
            cross_attn=cross_attn,
            weight=weight,
            proj_w=proj_w,
            proj_b=proj_b,
        )

    # ------------------------------------------------------------------ core
    def encode(
        self,
        params: MultilayerParams,
        batch: MultiplexBatch,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Cross-view node embeddings [N, D] (or [N, P] with projection)."""
        cfg = self.cfg
        S, N, K1 = batch.neigh.shape
        x = batch.x.astype(jnp.dtype(cfg.compute_dtype))  # [S, N, D]

        if self.siamese:
            # Fold the view axis into the node axis: one [S·N, K+1, D] encoder
            # call — the MXU sees one big batch instead of S small ones.
            # Per-view-local neighbor ids shift by s·N into the flat table.
            offsets = (jnp.arange(S, dtype=jnp.int32) * N)[:, None, None]
            neigh_flat = (batch.neigh + offsets).reshape(S * N, K1)
            feat = x.reshape(S * N, -1)[neigh_flat]  # [S·N, K+1, D]
            if rng is not None:
                rng, r = jax.random.split(rng)
            else:
                r = None
            out = neighborhood_encoder(
                params.encoders[0],
                feat,
                num_heads=cfg.num_heads,
                dropout_rate=0.5,
                rng=r,
                axis=cfg.attention_axis,
                num_timesteps=cfg.num_timesteps,
                node_mask=jnp.tile(batch.node_mask, S),
            )  # [S·N, D]
            per_view = out.reshape(S, N, -1)
        else:
            outs = []
            for s in range(S):
                feat = x[s][batch.neigh[s]]  # [N, K+1, D]
                if rng is not None:
                    rng, r = jax.random.split(rng)
                else:
                    r = None
                outs.append(
                    neighborhood_encoder(
                        params.encoders[s],
                        feat,
                        num_heads=cfg.num_heads,
                        dropout_rate=0.5,
                        rng=r,
                        axis=cfg.attention_axis,
                        num_timesteps=cfg.num_timesteps,
                        node_mask=batch.node_mask,
                    )
                )
            per_view = jnp.stack(outs, axis=0)  # [S, N, D]

        # cross-view attention: sequence = views, batch = nodes, keep last slot
        stacked = per_view.transpose(1, 0, 2).astype(jnp.float32)  # [N, S, D]
        if rng is not None:
            rng, r_mha = jax.random.split(rng)
        else:
            r_mha = None
        attended = multihead_attention(
            params.cross_attn, stacked, num_heads=1,
            dropout_rate=cfg.dropout, rng=r_mha,
        )
        z = attended[:, -1, :]  # (python_multi_layer_siamese_u2gnn.py:86-89)
        if params.proj_w is not None:
            z = jax.nn.leaky_relu(z @ params.proj_w + params.proj_b)
        return z

    def loss(
        self,
        params: MultilayerParams,
        batch: MultiplexBatch,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Training loss over the global ``weight`` table, per-view summed
        (the reference computes the loss on ``[weight]*num_layers`` with the
        per-view adjacency, ``python_multi_layer_siamese_u2gnn.py:92-96``).

        ``encode`` still participates: the cross-view embedding multiplies the
        weight table elementwise before the loss (``pytorch_U2GNN_UnSup.py:79``
        pattern carried into the multilayer wrapper)."""
        cfg = self.cfg
        z = self.encode(params, batch, rng=rng)
        emb = params.weight * z if z.shape == params.weight.shape else params.weight
        embs = [emb] * self.num_views
        if cfg.loss_type == "contrastive":
            total = 0.0
            for s in range(self.num_views):
                total = total + supcon_loss(
                    embs[s], mask=batch.adj[:, :, s], valid=batch.node_mask
                )
            return total
        if cfg.loss_type == "gae":
            n_real = jnp.sum(batch.node_mask)
            n_pos = jnp.sum(batch.adj) / self.num_views
            norm = (n_real * n_real) / jnp.maximum(
                2.0 * (n_real * n_real - n_pos), 1.0
            )
            return gae_loss(embs, batch.adj, norm)
        raise ValueError(
            f"multilayer model supports contrastive|gae, got {cfg.loss_type!r}"
        )

    def node_embeddings(self, params: MultilayerParams) -> jax.Array:
        """The detached node-embedding table the trainer evaluates
        (``TransformerMLU2GNN.forward -> (loss, weight.detach())``)."""
        return params.weight


def build_multiplex_batch(
    x: np.ndarray,  # [N, D] shared or [N, D, S] per-view features
    adj_stack: np.ndarray,  # [N, N, S] dense per-view adjacency
    num_neighbors: int,
    rng: np.random.Generator,
) -> MultiplexBatch:
    """Host-side multiplex batch assembly: per-view fixed-fanout sampling with
    replacement from each view's adjacency (semantics of
    ``ml_node_train_utils.py:179-206``), self at slot 0, isolated → self."""
    N, _, S = adj_stack.shape
    K = num_neighbors
    neigh = np.zeros((S, N, K + 1), dtype=np.int32)
    for s in range(S):
        a = adj_stack[:, :, s] > 0
        deg = a.sum(axis=1)
        neigh[s, :, 0] = np.arange(N)
        for v in range(N):
            if deg[v] > 0:
                nbrs = np.nonzero(a[v])[0]
                neigh[s, v, 1:] = rng.choice(nbrs, size=K, replace=True)
            else:
                neigh[s, v, 1:] = v
    x = np.asarray(x, np.float32)
    if x.ndim == 2:
        xs = np.stack([x] * S, axis=0)  # shared features across views
    else:
        xs = np.ascontiguousarray(np.moveaxis(x, 2, 0))  # [N,D,S] -> [S,N,D]
    return MultiplexBatch(
        x=jnp.asarray(xs),
        neigh=jnp.asarray(neigh),
        adj=jnp.asarray(adj_stack, jnp.float32),
        node_mask=jnp.ones((N,), jnp.float32),
    )


def batch_from_dataset(
    ds, num_neighbors: int, rng: Optional[np.random.Generator] = None
) -> MultiplexBatch:
    """Build a transductive batch from a
    :class:`~graph_transformer_tpu.data.multiplex.MultiplexDataset`."""
    rng = rng or np.random.default_rng(0)
    return build_multiplex_batch(ds.x, ds.adj, num_neighbors, rng)
