"""Supervised U2GNN: graph classification.

Capability parity with ``U2GNN_pytorch/pytorch_U2GNN_Sup.py`` (and the TF
twin ``model_U2GNN_Sup_multi.py``): k stacked U2GNN layers, each a T-step
transformer encoder over sampled neighborhoods; after each layer the updated
self vectors are re-gathered as the next layer's neighborhood features
(``pytorch_U2GNN_Sup.py:39``); per-layer graph sum-pooling feeds a per-layer
dropout + Linear head and the final prediction is the **sum of per-layer
scores** (``pytorch_U2GNN_Sup.py:30-46``).

TPU notes: the whole forward is static-shape on a padded batch; pooling is a
segment-sum (no sparse matrices); the K+1 neighborhood attention is batched
over all nodes so the MXU sees [N_pad·(K+1), D]-scale matmuls.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from graph_transformer_tpu.config import ModelConfig
from graph_transformer_tpu.data.batching import GraphBatch
from graph_transformer_tpu.ops.attention import (
    TransformerEncoderParams,
    init_encoder_params,
    neighborhood_encoder,
    _dropout,
    _xavier,
)
from graph_transformer_tpu.ops.sparse import graph_sum_pool


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class U2GNNSupParams:
    encoders: Tuple[TransformerEncoderParams, ...]  # k U2GNN layers
    head_w: jax.Array  # [k, D, C]
    head_b: jax.Array  # [k, C]
    # UT recurrence transition params per U2GNN layer (None for basic/skip)
    rec: Tuple = ()


@dataclasses.dataclass(frozen=True)
class U2GNNSup:
    """Static model spec; parameters live in :class:`U2GNNSupParams`."""

    feature_dim: int
    num_classes: int
    cfg: ModelConfig

    def init(self, key: jax.Array) -> U2GNNSupParams:
        k = self.cfg.num_hidden_layers
        D, C = self.feature_dim, self.num_classes
        # a non-basic UT transition implies weight tying (the t2t recurrence
        # reuses one layer's weights each timestep)
        tied = self.cfg.share_timestep_weights or self.cfg.recurrence != "basic"
        stored_layers = 1 if tied else self.cfg.num_timesteps
        encoders = tuple(
            init_encoder_params(
                jax.random.fold_in(key, i),
                stored_layers,
                D,
                self.cfg.ff_hidden_size,
            )
            for i in range(k)
        )
        hw = jnp.stack(
            [
                _xavier(jax.random.fold_in(key, 1000 + i), (D, C))
                for i in range(k)
            ]
        )
        from graph_transformer_tpu.ops.ut_recurrence import (
            init_recurrence_params,
        )

        rec = tuple(
            init_recurrence_params(
                jax.random.fold_in(key, 2000 + i), self.cfg.recurrence, D
            )
            for i in range(k)
        )
        return U2GNNSupParams(
            encoders=encoders, head_w=hw, head_b=jnp.zeros((k, C)), rec=rec
        )

    def apply(
        self,
        params: U2GNNSupParams,
        batch: GraphBatch,
        rng: Optional[jax.Array] = None,  # None => deterministic (eval)
        return_ponder: bool = False,
        neigh_feat: Optional[jax.Array] = None,  # [N_pad, K+1, D] precomputed
        neigh_global: Optional[jax.Array] = None,  # [N_pad, K+1] global ids
        num_total_nodes: Optional[int] = None,  # dataset size (fast path)
        sampled_inputs: Optional[tuple] = None,  # (tag_rows, deg, self_tag,
        #                                           codebook)
    ) -> jax.Array:
        """Return prediction scores [B, C] (``(scores, ponder)`` when
        ``return_ponder`` — the summed ACT ponder cost over U2GNN layers,
        0.0 for non-ACT recurrences; trainers add
        ``cfg.model.act_loss_weight * ponder`` to the loss, matching t2t's
        act_loss, ``universal_transformer_modified.py:343``)."""
        cfg = self.cfg
        B = batch.num_graphs
        if sampled_inputs is not None:
            # Fully-fused sample+gather+encode (one-hot datasets): the
            # kernel samples neighborhoods and builds the one-hot features
            # in VMEM — nothing to gather here.  Single-layer stacks only
            # (the kernel emits no neighbor ids to re-gather through).
            from graph_transformer_tpu.ops.pallas_sampled_encoder import (
                fused_u2gnn_encoder_sampled,
            )

            assert len(params.encoders) == 1 and rng is not None
            assert cfg.recurrence == "basic" and cfg.num_heads == 1
            # the kernel implements neighborhood-axis attention only; the
            # 'node' compat quirk must go through the unfused paths
            assert cfg.attention_axis == "neighborhood"
            enc = params.encoders[0]
            rng, r_enc, r_drop = jax.random.split(rng, 3)
            seed = jax.random.randint(r_enc, (1,), 0, 2**31 - 1, jnp.int32)
            stacked = (
                enc.w_in, enc.b_in, enc.w_out, enc.b_out,
                enc.ln1_scale, enc.ln1_bias,
                enc.w_ff1, enc.b_ff1, enc.w_ff2, enc.b_ff2,
                enc.ln2_scale, enc.ln2_bias,
            )
            tag_rows, degb, self_tag, codebook = sampled_inputs
            from graph_transformer_tpu.ops.pallas_folded import (
                folded_shape_ok,
            )

            if cfg.use_folded and folded_shape_ok(
                batch.neigh.shape[1], codebook.shape[1]
            ):
                from graph_transformer_tpu.ops.pallas_folded import (
                    folded_u2gnn_encoder_sampled,
                )

                # tile: 256 at the bench width (the slot0 last layer
                # freed enough scoped VMEM for it in-scan; 320 still
                # OOMs); 128 at wider folds (MUTAG D=7).  GT_FOLDED_TILE
                # overrides (the heavy-tail bench needs 192 - its larger
                # grid tips the 256 schedule 1.2 MB over the limit).
                import os as _os

                S_ = batch.neigh.shape[1]
                tile = 256 if S_ * codebook.shape[1] <= 40 else 112
                tile = int(_os.environ.get("GT_FOLDED_TILE", tile))
                out = folded_u2gnn_encoder_sampled(
                    tag_rows, degb, self_tag, codebook, stacked, seed,
                    S_, cfg.num_timesteps, 0.5, tile,
                )  # [N_pad, D] f32 (folded lanes, stored-residual bwd)
            elif cfg.use_stored_bwd or cfg.use_folded:
                from graph_transformer_tpu.ops.pallas_stored_bwd import (
                    fused_u2gnn_encoder_sampled_stored,
                )

                # tile 384 fits D<=19 (PTC); wide feature dims (IMDB
                # degree tags, D=65) need 256 (VMEM scales with D)
                out = fused_u2gnn_encoder_sampled_stored(
                    tag_rows, degb, self_tag, codebook, stacked, seed,
                    batch.neigh.shape[1], cfg.num_timesteps, 0.5,
                    384 if codebook.shape[1] <= 32 else 192,
                )  # [N_pad, D] f32 (stored-residual bwd)
            else:
                out = fused_u2gnn_encoder_sampled(
                    tag_rows, degb, self_tag, codebook, stacked, seed,
                    batch.neigh.shape[1], cfg.num_timesteps, 0.5,
                )  # [N_pad, D] f32
            pooled = graph_sum_pool(
                out * batch.node_mask[:, None], batch.graph_id, B
            )
            pooled = _dropout(pooled, cfg.dropout, r_drop)
            scores = pooled @ params.head_w[0] + params.head_b[0]
            if return_ponder:
                return scores, jnp.zeros(())
            return scores
        if neigh_feat is None:
            x = batch.x.astype(jnp.dtype(cfg.compute_dtype))
            neigh_feat = x[batch.neigh]  # [N_pad, K+1, D]
        else:
            # precomputed by the trainer's fast sampling path (globally
            # indexed gather).  Deeper stacks re-gather between layers via
            # ``neigh_global`` + a global scratch (ops.sparse.global_regather)
            # — the fast sampler emits global ids, not batch-local ones.
            assert len(params.encoders) == 1 or neigh_global is not None
            neigh_feat = neigh_feat.astype(jnp.dtype(cfg.compute_dtype))
        scores = 0.0
        ponder = jnp.zeros(())
        for i, enc in enumerate(params.encoders):
            if rng is not None:
                rng, r_enc, r_drop = jax.random.split(rng, 3)
            else:
                r_enc = r_drop = None
            out = neighborhood_encoder(
                enc,
                neigh_feat,
                num_heads=cfg.num_heads,
                # dropout inside the encoder is hardcoded 0.5 in the reference
                # regardless of the --dropout flag (pytorch_U2GNN_Sup.py:20)
                dropout_rate=0.5,
                rng=r_enc,
                axis=cfg.attention_axis,
                num_timesteps=cfg.num_timesteps,
                node_mask=batch.node_mask,
                use_pallas=cfg.use_pallas,
                whole_encoder=cfg.use_pallas_whole_encoder,
                recurrence=cfg.recurrence,
                rec_params=params.rec[i] if params.rec else None,
                return_ponder=return_ponder,
            )  # [N_pad, D]
            if return_ponder:
                out, p_i = out
                ponder = ponder + p_i
            # re-gather updated self vectors as next layer's neighborhoods
            if i + 1 < len(params.encoders):
                if neigh_global is not None:
                    from graph_transformer_tpu.ops.sparse import (
                        global_regather,
                    )

                    neigh_feat = global_regather(
                        out, batch.node_gidx, batch.node_mask,
                        neigh_global, num_total_nodes,
                    )
                else:
                    neigh_feat = out[batch.neigh]
            pooled = graph_sum_pool(
                out.astype(jnp.float32) * batch.node_mask[:, None], batch.graph_id, B
            )
            if r_drop is not None:
                pooled = _dropout(pooled, cfg.dropout, r_drop)
            scores = scores + pooled @ params.head_w[i] + params.head_b[i]
        if return_ponder:
            return scores, ponder
        return scores
