"""Unsupervised U2GNN: node embeddings via sampled softmax.

Primary semantics are the TF implementation's (the clean path per SURVEY.md
§3.2: the fork's PyTorch variant is broken at HEAD): k U2GNN layers with
re-gathered self vectors between layers, per-layer outputs **concatenated**
into [N, k·D], then a log-uniform sampled softmax over the node vocabulary
with the node's own global index as the label
(``model_U2GNN_Unsup_multi.py:44-58``).  The learned output-embedding matrix
``W [V, k·D]`` is the node embedding used for evaluation
(``train_U2GNN_Unsup.py:203-225``).

Fork extensions are available as options:

- ``head='cross_attention'``: stack per-layer outputs [N, k, D], run a
  cross-layer MultiheadAttention, keep the last slot, multiply elementwise by
  a learned ``weight [V, D]`` (``pytorch_U2GNN_UnSup.py:69-79``) — requires
  the transductive whole-dataset batch (N_pad rows aligned to the vocab).
- ``loss_type``: 'default' (sampled softmax), 'gae', 'contrastive'
  (``pytorch_U2GNN_UnSup.py:81-89``).
- ``regather=False``: the fork feeds the full neighborhood tensor to the next
  layer instead of re-gathering (``pytorch_U2GNN_UnSup.py:57-58,62``).
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
    MHAParams,
    TransformerEncoderParams,
    init_encoder_params,
    init_mha_params,
    multihead_attention,
    neighborhood_encoder,
    transformer_encoder,
    _dropout,
)
from graph_transformer_tpu.ops.losses import gae_loss, supcon_loss
from graph_transformer_tpu.ops.sampled_softmax import (
    SampledSoftmaxParams,
    init_sampled_softmax_params,
    sampled_softmax_loss,
)
from graph_transformer_tpu.sampling.log_uniform import LogUniformSpec


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class U2GNNUnsupParams:
    encoders: Tuple[TransformerEncoderParams, ...]
    ss: SampledSoftmaxParams  # output embedding [V, k·D] (or [V, D] fork head)
    cross_attn: Optional[MHAParams]  # fork cross-layer attention
    weight: Optional[jax.Array]  # [V, D] fork node-embedding table


@dataclasses.dataclass(frozen=True)
class U2GNNUnsup:
    feature_dim: int
    vocab_size: int  # total node count (the sampled-softmax vocabulary)
    cfg: ModelConfig
    head: str = "concat"  # concat (TF clean) | cross_attention (fork)

    @property
    def embedding_dim(self) -> int:
        if self.head == "concat":
            return self.feature_dim * self.cfg.num_hidden_layers
        return self.feature_dim

    def spec(self) -> LogUniformSpec:
        return LogUniformSpec.create(self.vocab_size, self.cfg.sampled_num)

    def init(self, key: jax.Array) -> U2GNNUnsupParams:
        cfg = self.cfg
        D = self.feature_dim
        stored = 1 if cfg.share_timestep_weights else cfg.num_timesteps
        encoders = tuple(
            init_encoder_params(
                jax.random.fold_in(key, i), stored, D, cfg.ff_hidden_size
            )
            for i in range(cfg.num_hidden_layers)
        )
        ss = init_sampled_softmax_params(
            jax.random.fold_in(key, 999), self.vocab_size, self.embedding_dim
        )
        cross_attn = None
        weight = None
        if self.head == "cross_attention":
            cross_attn = init_mha_params(jax.random.fold_in(key, 998), D)
            stdv = math.sqrt(6.0 / (self.vocab_size + D))
            weight = jax.random.uniform(
                jax.random.fold_in(key, 997),
                (self.vocab_size, D),
                jnp.float32,
                -stdv,
                stdv,
            )
        return U2GNNUnsupParams(
            encoders=encoders, ss=ss, cross_attn=cross_attn, weight=weight
        )

    # ------------------------------------------------------------------ core
    def encode(
        self,
        params: U2GNNUnsupParams,
        batch: GraphBatch,
        rng: Optional[jax.Array] = None,
        regather: bool = True,
        neigh_feat: Optional[jax.Array] = None,  # [N_pad, K+1, D] precomputed
        neigh_global: Optional[jax.Array] = None,  # [N_pad, K+1] global ids
        num_total_nodes: Optional[int] = None,  # dataset size (fast path)
        sampled_inputs: Optional[tuple] = None,  # (tag_rows, deg,
        #                                           self_tag, codebook)
    ) -> jax.Array:
        """Per-node representation: [N_pad, k·D] (concat) or [N_pad, D].

        ``neigh_feat``: first-layer neighborhood features already gathered
        (the Pallas fast-sampling path supplies these from the *global*
        feature table; see sampling/pallas_sampler.py).  Deeper layers with
        ``regather=True`` re-gather through ``neigh_global`` + a global
        scratch (ops.sparse.global_regather) on the fast path, or by the
        batch-local ``batch.neigh`` otherwise."""
        cfg = self.cfg
        if sampled_inputs is not None:
            # Fully-fused sample+gather+encode (mirrors U2GNNSup.apply):
            # the kernel's slot-0 output IS the per-node embedding for the
            # single-layer concat head the unsup protocol uses.
            assert (len(params.encoders) == 1 and self.head == "concat"
                    and cfg.recurrence == "basic" and cfg.num_heads == 1
                    and cfg.attention_axis == "neighborhood")
            enc = params.encoders[0]
            if rng is not None:
                rng, r_enc = jax.random.split(rng)
                seed = jax.random.randint(r_enc, (1,), 0, 2**31 - 1,
                                          jnp.int32)
                rate = 0.5  # reference-hardcoded encoder dropout
            else:
                seed, rate = None, 0.0
            stacked = (
                enc.w_in, enc.b_in, enc.w_out, enc.b_out,
                enc.ln1_scale, enc.ln1_bias,
                enc.w_ff1, enc.b_ff1, enc.w_ff2, enc.b_ff2,
                enc.ln2_scale, enc.ln2_bias,
            )
            tag_rows, degb, self_tag, codebook = sampled_inputs
            S_ = batch.neigh.shape[1]
            from graph_transformer_tpu.ops.pallas_folded import (
                folded_shape_ok,
            )

            if cfg.use_folded and folded_shape_ok(S_, codebook.shape[1]):
                from graph_transformer_tpu.ops.pallas_folded import (
                    folded_u2gnn_encoder_sampled,
                )

                tile = 256 if S_ * codebook.shape[1] <= 40 else 112
                return folded_u2gnn_encoder_sampled(
                    tag_rows, degb, self_tag, codebook, stacked, seed,
                    S_, cfg.num_timesteps, rate, tile,
                )
            if cfg.use_stored_bwd or cfg.use_folded:
                from graph_transformer_tpu.ops.pallas_stored_bwd import (
                    fused_u2gnn_encoder_sampled_stored,
                )

                return fused_u2gnn_encoder_sampled_stored(
                    tag_rows, degb, self_tag, codebook, stacked, seed,
                    S_, cfg.num_timesteps, rate,
                    384 if codebook.shape[1] <= 32 else 192,
                )
            from graph_transformer_tpu.ops.pallas_sampled_encoder import (
                fused_u2gnn_encoder_sampled,
            )

            return fused_u2gnn_encoder_sampled(
                tag_rows, degb, self_tag, codebook, stacked, seed,
                S_, cfg.num_timesteps, rate,
            )
        if neigh_feat is None:
            x = batch.x.astype(jnp.dtype(cfg.compute_dtype))
            neigh_feat = x[batch.neigh]
        else:
            # Device-assembled batches carry a self-placeholder batch.neigh;
            # deep stacks must re-gather through neigh_global (mirrors the
            # U2GNNSup.apply guard — ADVICE r3).
            assert len(params.encoders) == 1 or neigh_global is not None, (
                "precomputed neigh_feat with num_hidden_layers >= 2 requires "
                "neigh_global (batch.neigh may be a stale placeholder)"
            )
            neigh_feat = neigh_feat.astype(jnp.dtype(cfg.compute_dtype))
        outs = []
        for enc in params.encoders:
            if rng is not None:
                rng, r_enc = jax.random.split(rng)
            else:
                r_enc = None
            if regather:
                out = neighborhood_encoder(
                    enc,
                    neigh_feat,
                    num_heads=cfg.num_heads,
                    dropout_rate=0.5,
                    rng=r_enc,
                    axis=cfg.attention_axis,
                    num_timesteps=cfg.num_timesteps,
                    node_mask=batch.node_mask,
                    use_pallas=cfg.use_pallas,
                )
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
            else:
                # fork variant: next layer consumes the full seq output
                full = transformer_encoder(
                    enc,
                    neigh_feat,
                    num_heads=cfg.num_heads,
                    dropout_rate=0.5,
                    rng=r_enc,
                    num_timesteps=cfg.num_timesteps,
                )
                out = full[:, 0, :]
                neigh_feat = full
            outs.append(out.astype(jnp.float32))

        if self.head == "concat":
            return jnp.concatenate(outs, axis=-1)  # [N, k·D]
        # fork head: cross-layer attention over the k layer outputs
        stacked = jnp.stack(outs, axis=1)  # [N, k, D]
        if rng is not None:
            rng, r_mha = jax.random.split(rng)
        else:
            r_mha = None
        attended = multihead_attention(
            params.cross_attn, stacked, num_heads=1,
            dropout_rate=cfg.dropout, rng=r_mha,
        )
        z = attended[:, -1, :]  # last slot (pytorch_U2GNN_UnSup.py:72-73)
        # elementwise multiply by the learned node-embedding table, gathered
        # at each row's global id (``weight ⊙ output``,
        # pytorch_U2GNN_UnSup.py:79 — there N == vocab_size; the gather makes
        # it hold for any padded/sharded batch too)
        return params.weight[batch.node_gidx] * z

    def loss(
        self,
        params: U2GNNUnsupParams,
        batch: GraphBatch,
        key: jax.Array,
        spec: LogUniformSpec,
        rng: Optional[jax.Array] = None,
        adj_mask: Optional[jax.Array] = None,  # [N, N] for contrastive
        csr=None,  # DeviceCSR, required for sampler_type='neighbor'
        neigh_feat: Optional[jax.Array] = None,  # fast-path gathered features
        neigh_global: Optional[jax.Array] = None,  # [N_pad, K+1] global ids
        num_total_nodes: Optional[int] = None,
        vocab_perm: Optional[jax.Array] = None,  # [N_total] permutation π
        sampled_inputs: Optional[tuple] = None,  # fused sample+encode path
    ) -> jax.Array:
        """Scalar training loss (sum of per-node sampled-softmax logits, the
        reference's objective ``loss = torch.sum(logits)``,
        ``train_pytorch_U2GNN_UnSup.py:155-156``).

        ``vocab_perm``: the id-symmetric leak control (round-4 finding,
        ROADMAP 8c) — train node v's output-embedding row at the PERMUTED
        index π(v), so the log-uniform candidate pressure (a strong
        function of numeric id) becomes independent of the class-sorted
        file position without touching the data pipeline.  Eval reads
        ``node_embeddings(params, vocab_perm=π)`` to undo the indexing."""
        cfg = self.cfg
        z = self.encode(
            params, batch, rng=rng, neigh_feat=neigh_feat,
            neigh_global=neigh_global, num_total_nodes=num_total_nodes,
            sampled_inputs=sampled_inputs,
        )
        if cfg.loss_type == "default":
            if rng is not None:
                rng, r_drop = jax.random.split(rng)
                z = _dropout(z, cfg.dropout, r_drop)
            if cfg.sampler_type == "neighbor":
                if csr is None:
                    raise ValueError("sampler_type='neighbor' needs csr")
                from graph_transformer_tpu.ops.sampled_neighbor import (
                    sampled_neighbor_loss,
                )

                per_node = sampled_neighbor_loss(
                    params.ss, key, z, batch.node_gidx, csr,
                    cfg.sampled_num, mask=batch.node_mask,
                )
                return jnp.sum(per_node)
            labels = batch.node_gidx
            if vocab_perm is not None:
                labels = vocab_perm[labels]
            per_node = sampled_softmax_loss(
                params.ss,
                key,
                z,
                labels,
                spec,
                mode=cfg.sampled_softmax_mode,
                mask=batch.node_mask,
            )
            return jnp.sum(per_node)
        if cfg.loss_type == "contrastive":
            if adj_mask is None:
                raise ValueError("contrastive loss needs adj_mask")
            emb = params.weight if params.weight is not None else z
            if params.weight is not None:
                # the fork trains the VOCAB-sized table (``args_loss =
                # Namespace(features=self.weight, ...)``,
                # pytorch_U2GNN_UnSup.py:86-88): rows are global node ids,
                # so slice the padded-batch mask to the vocabulary — every
                # table row is a real node
                V = emb.shape[0]
                return supcon_loss(
                    emb, mask=adj_mask[:V, :V], valid=jnp.ones(V)
                )
            return supcon_loss(emb, mask=adj_mask, valid=batch.node_mask)
        if cfg.loss_type == "gae":
            emb = params.weight if params.weight is not None else z
            if adj_mask is None:
                raise ValueError("gae loss needs adj_mask (target adjacency)")
            if params.weight is not None:
                V = emb.shape[0]
                adj_mask = adj_mask[:V, :V]
                n_real = jnp.asarray(V, jnp.float32)
            else:
                n_real = jnp.sum(batch.node_mask)
            n_pos = jnp.sum(adj_mask)
            norm = (n_real * n_real) / jnp.maximum(
                2.0 * (n_real * n_real - n_pos), 1.0
            )
            return gae_loss([emb], adj_mask[:, :, None], norm)
        raise ValueError(f"unknown loss_type {cfg.loss_type!r}")

    def node_embeddings(
        self, params: U2GNNUnsupParams,
        vocab_perm: Optional[jax.Array] = None,
    ) -> jax.Array:
        """The evaluation embedding table: the sampled-softmax output matrix
        (``train_pytorch_U2GNN_UnSup.py:168``, TF ``W:0``).  Under the
        id-symmetric protocol node v trained row ``vocab_perm[v]``; return
        rows in node order so pooling/probing is unchanged."""
        if self.head == "cross_attention" and params.weight is not None:
            return params.weight
        if vocab_perm is not None:
            return params.ss.weight[vocab_perm]
        return params.ss.weight
