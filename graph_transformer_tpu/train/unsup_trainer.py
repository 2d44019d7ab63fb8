"""Unsupervised (node-embedding) trainer.

Semantics of the clean reference path (``U2GNN_tf/train_U2GNN_Unsup.py`` +
``train_pytorch_U2GNN_UnSup.py``): transductive training over ALL graphs
(``README.md:53``), per step a random subset of graphs whose nodes become
sampled-softmax examples with their own global index as label
(``input_y``, ``train_pytorch_U2GNN_UnSup.py:126``), objective
``loss = Σ per-node sampled-softmax`` (``:155-156``), evaluation by
sum-pooling the learned output-embedding matrix to graph level and fitting
10-fold logistic regression (``:164-188``).

On TPU, candidate sampling + neighbor resampling both happen inside the
jitted step; the host only chooses graph ids.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from graph_transformer_tpu.config import ExperimentConfig
from graph_transformer_tpu.data.batching import BatchBuilder, GraphBatch
from graph_transformer_tpu.data.tu import GraphDataset
from graph_transformer_tpu.models.u2gnn_unsup import U2GNNUnsup
from graph_transformer_tpu.sampling.neighbors import DeviceCSR, resample_batch_neighbors
from graph_transformer_tpu.sampling.pallas_sampler import (
    build_neighbor_table,
    resample_batch_neighbors_fast,
)
from graph_transformer_tpu.train.evaluate import (
    pool_node_embeddings,
    tenfold_logistic_accuracy,
)
from graph_transformer_tpu.train.optim import (
    PlateauStepLR,
    make_optimizer,
    set_lr_scale,
)


class UnsupTrainer:
    def __init__(self, ds: GraphDataset, cfg: ExperimentConfig):
        self.ds = ds
        self.cfg = cfg
        self.builder = BatchBuilder(
            ds,
            batch_size=cfg.data.batch_size,
            num_neighbors=cfg.data.num_neighbors,
            pad_multiple=cfg.data.pad_multiple,
            seed=cfg.data.seed,
        )
        if cfg.model.model == "gcn_unsup":
            from graph_transformer_tpu.models.gcn_unsup_graphs import GCNGraphUnsup

            self.model = GCNGraphUnsup(ds.feature_dim, ds.num_nodes, cfg.model)
        else:
            self.model = U2GNNUnsup(ds.feature_dim, ds.num_nodes, cfg.model)
        self.spec = self.model.spec()
        self.params = self.model.init(jax.random.key(cfg.train.seed))
        self.opt = make_optimizer(cfg.train.learning_rate, cfg.train.grad_clip_norm)
        self.opt_state = self.opt.init(self.params)
        need_csr = (
            cfg.train.on_device_sampling or cfg.model.sampler_type == "neighbor"
        )
        self.csr = DeviceCSR.from_dataset(ds) if need_csr else None
        # Fast sampling path (same gate as SupTrainer): one Pallas
        # PRNG+lane-gather pass sampling *global* neighbor ids, features
        # gathered from the global table — applicable when every degree fits
        # the 128-lane gather width.  Deeper stacks re-gather between layers
        # through a global scratch (ops.sparse.global_regather).
        self.nbr_table = None
        self._tag_table = None
        if (
            cfg.train.on_device_sampling
            and cfg.model.model != "gcn_unsup"
            and jax.default_backend() == "tpu"
        ):
            tb = build_neighbor_table(ds, hub_seed=cfg.train.seed)
            if tb is not None:
                self.nbr_table = jnp.asarray(tb)
                self._deg_dev = jnp.asarray(ds.degrees, jnp.int32)
                self._x_global = jnp.asarray(
                    ds.node_feat, jnp.dtype(cfg.model.compute_dtype)
                )
                # Fully-fused sample+gather+encode (mirrors SupTrainer):
                # one kernel samples, rebuilds codebook features in VMEM,
                # and runs the encoder — the unsup z IS its slot-0 output
                from graph_transformer_tpu.ops.pallas_sampled_encoder import (
                    fused_gate_ok,
                    setup_fused_tables,
                )

                if (fused_gate_ok(cfg.model)
                        and cfg.model.loss_type == "default"
                        and cfg.model.sampler_type != "neighbor"):
                    ft = setup_fused_tables(ds.node_feat, tb)
                    if ft is not None:
                        tag_tb, tags, codebook = ft
                        self._tag_table = jnp.asarray(tag_tb)
                        self._tags_dev = jnp.asarray(tags)
                        self._codebook = jnp.asarray(codebook)
        self._key = jax.random.key(cfg.train.seed + 1)
        self.epoch_losses: List[float] = []
        self.lr_scale = 1.0
        self.num_batches_per_epoch = max(
            1, (ds.num_graphs + cfg.data.batch_size - 1) // cfg.data.batch_size
        )
        self.sched = PlateauStepLR(
            self.num_batches_per_epoch,
            cfg.train.lr_decay_gamma,
            cfg.train.plateau_window,
        )

        # id-symmetric protocol: one fixed random permutation per run
        # (seeded off the train seed; see ModelConfig.id_symmetric)
        self._vocab_perm = None
        if cfg.model.id_symmetric:
            self._vocab_perm = jnp.asarray(
                np.random.default_rng(cfg.train.seed + 7).permutation(
                    ds.num_nodes
                ),
                jnp.int32,
            )

        model, opt, spec = self.model, self.opt, self.spec
        vocab_perm = self._vocab_perm
        on_dev = cfg.train.on_device_sampling
        K = cfg.data.num_neighbors
        total_nodes = ds.num_nodes
        fast = self.nbr_table is not None
        nbr_table = self.nbr_table
        deg_dev = getattr(self, "_deg_dev", None)
        x_global = getattr(self, "_x_global", None)
        fused_sampling = self._tag_table is not None
        tag_table = self._tag_table
        tags_dev = getattr(self, "_tags_dev", None)
        codebook = getattr(self, "_codebook", None)

        def _resample(b, k_samp, csr):
            """(batch, neigh_feat, neigh_global, sampled_inputs) with fresh
            neighborhoods — the fast path samples global ids in one Pallas
            pass; the fused path defers sampling INTO the encoder kernel
            (see SupTrainer)."""
            if not on_dev:
                return b, None, None, None
            if fused_sampling:
                si = (
                    tag_table[b.node_gidx],
                    deg_dev[b.node_gidx][:, None],
                    tags_dev[b.node_gidx][:, None],
                    codebook,
                )
                return b, None, None, si
            if fast:
                seed = jax.random.randint(k_samp, (1,), 0, 2**31 - 1, jnp.int32)
                neigh_g = resample_batch_neighbors_fast(
                    seed, nbr_table[b.node_gidx], deg_dev[b.node_gidx][:, None],
                    b.node_gidx, K,
                )
                return b, x_global[neigh_g], neigh_g, None
            neigh = resample_batch_neighbors(
                k_samp, csr, b.node_gidx, b.node_mask, K, total_nodes
            )
            return dataclasses.replace(b, neigh=neigh), None, None, None

        @partial(jax.jit, donate_argnums=(0, 1))
        def _train_step(params, opt_state, batch: GraphBatch, key, csr):
            k_samp, k_cand, k_drop = jax.random.split(key, 3)
            batch, nf, ng, si = _resample(batch, k_samp, csr)

            def loss_fn(p):
                return model.loss(
                    p, batch, k_cand, spec, rng=k_drop, csr=csr, neigh_feat=nf,
                    neigh_global=ng, num_total_nodes=total_nodes,
                    vocab_perm=vocab_perm, sampled_inputs=si,
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss

        @partial(jax.jit, donate_argnums=(0, 1))
        def _train_scan_stacked(params, opt_state, batches: GraphBatch, key, csr):
            """One epoch as one device program (see SupTrainer): scan over a
            leading stacked-batch axis; candidate sampling + neighborhood
            resampling still happen per step on device."""

            def body(carry, inp):
                p, s = carry
                b, i = inp
                step_key = jax.random.fold_in(key, i)
                k_samp, k_cand, k_drop = jax.random.split(step_key, 3)
                b, nf, ng, si = _resample(b, k_samp, csr)

                def loss_fn(pp):
                    return model.loss(
                        pp, b, k_cand, spec, rng=k_drop, csr=csr, neigh_feat=nf,
                        neigh_global=ng, num_total_nodes=total_nodes,
                        vocab_perm=vocab_perm, sampled_inputs=si,
                    )

                loss, grads = jax.value_and_grad(loss_fn)(p)
                updates, s = opt.update(grads, s, p)
                p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
                return (p, s), loss

            n = batches.labels.shape[0]
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (batches, jnp.arange(n))
            )
            return params, opt_state, jnp.sum(losses)

        self._train_step = _train_step
        self._train_scan_stacked = _train_scan_stacked

    def train_epoch_stacked(self) -> float:
        """:meth:`train_epoch` semantics in one device dispatch."""
        batches = [self.builder.sample() for _ in range(self.num_batches_per_epoch)]
        stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)
        self._key, sub = jax.random.split(self._key)
        self.params, self.opt_state, total = self._train_scan_stacked(
            self.params, self.opt_state, stacked, sub, self.csr
        )
        total = float(total)
        self.epoch_losses.append(total)
        new_scale = self.sched.update(self.epoch_losses)
        if new_scale != self.lr_scale:
            self.lr_scale = new_scale
            self.opt_state = set_lr_scale(self.opt_state, self.lr_scale)
        return total

    def train_epoch(self) -> float:
        total = 0.0
        for _ in range(self.num_batches_per_epoch):
            batch = self.builder.sample()
            self._key, sub = jax.random.split(self._key)
            self.params, self.opt_state, loss = self._train_step(
                self.params, self.opt_state, batch, sub, self.csr
            )
            total += float(loss)
        self.epoch_losses.append(total)
        new_scale = self.sched.update(self.epoch_losses)
        if new_scale != self.lr_scale:
            self.lr_scale = new_scale
            self.opt_state = set_lr_scale(self.opt_state, self.lr_scale)
        return total

    def evaluate(self) -> tuple:
        """(mean, std) 10-fold logistic accuracy of pooled graph embeddings."""
        emb = np.asarray(
            self.model.node_embeddings(self.params,
                                       vocab_perm=self._vocab_perm)
        )
        graph_emb = pool_node_embeddings(emb, self.ds.graph_offsets)
        return tenfold_logistic_accuracy(graph_emb, self.ds.labels)


def train_evaluate_unsup(
    ds: GraphDataset, cfg: ExperimentConfig, log_fn=print
) -> Dict[str, object]:
    trainer = UnsupTrainer(ds, cfg)
    history = []
    best_mean, best_std = 0.0, 0.0
    for epoch in range(1, cfg.train.num_epochs + 1):
        t0 = time.time()
        loss = (
            trainer.train_epoch_stacked()
            if cfg.train.scan_epochs
            else trainer.train_epoch()
        )
        if epoch % cfg.train.eval_every == 0:
            mean, std = trainer.evaluate()
        else:
            mean, std = float("nan"), float("nan")
        if mean == mean and mean > best_mean:
            best_mean, best_std = mean, std
        dt = time.time() - t0
        history.append(
            {"epoch": epoch, "loss": loss, "acc_mean": mean, "acc_std": std, "sec": dt}
        )
        log_fn(
            f"epoch {epoch:03d} | loss {loss:12.2f} | acc {mean:.4f}±{std:.4f} | {dt:.2f}s"
        )
    return {
        "history": history,
        "best_mean": best_mean,
        "best_std": best_std,
        "trainer": trainer,
    }
