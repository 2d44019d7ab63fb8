"""Single-graph node-classification trainer.

Capability parity with ``node_train_utils.py`` (the reference's citation-graph
pipeline): transductive training of a u2gnn / gcn / gat encoder over one full
graph with fresh per-step neighborhood resampling
(``node_train_utils.py:106-126``), the three unsupervised loss heads
(sampled-softmax / GAE / contrastive, ``:206-217``), and evaluation of the
learned node embeddings by 2-fold logistic regression (``:251-277``), a
train/test-mask probe, or kmeans clustering metrics.

The single graph is a one-graph :class:`GraphDataset`, so the padded batch,
the on-device neighborhood resampling, and all three model families are the
same code paths the graph-level trainers use — the vocabulary is simply the
node count.
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
from graph_transformer_tpu.data.batching import GraphBatch, whole_dataset_batch
from graph_transformer_tpu.data.citation import NodeGraphDataset
from graph_transformer_tpu.sampling.neighbors import (
    DeviceCSR,
    resample_batch_neighbors,
)
from graph_transformer_tpu.train.evaluate import logistic_regression_probe
from graph_transformer_tpu.train.optim import (
    make_optimizer,
    PlateauStepLR,
    set_lr_scale,
)
from graph_transformer_tpu.utils.metrics import eval_from_embeddings


def _make_model(ds: NodeGraphDataset, cfg: ExperimentConfig):
    """Model factory ≙ ``node_train_utils.model_creation_util``
    (``node_train_utils.py:176-204``): u2gnn uses the fork's cross-layer-
    attention head (``pytorch_U2GNN_UnSup.py:69-79``), gcn/gat are the VGAE-
    style encoders on the sparse substrate."""
    name = cfg.model.model
    if name in ("u2gnn", "u2gnn_unsup", "u2gnn_sup"):
        from graph_transformer_tpu.models.u2gnn_unsup import U2GNNUnsup

        return U2GNNUnsup(
            ds.feature_dim, ds.num_nodes, cfg.model, head="cross_attention"
        )
    if name == "gcn":
        from graph_transformer_tpu.models.gcn import GCNModel

        return GCNModel(ds.feature_dim, ds.num_nodes, cfg.model)
    if name == "gat":
        from graph_transformer_tpu.models.gat import GATModel

        return GATModel(ds.feature_dim, ds.num_nodes, cfg.model)
    raise ValueError(f"unknown node model {name!r} (u2gnn | gcn | gat)")


class NodeTrainer:
    def __init__(self, ds: NodeGraphDataset, cfg: ExperimentConfig):
        self.ds = ds
        self.cfg = cfg
        g = ds.graph
        self.model = _make_model(ds, cfg)
        self.spec = self.model.spec()
        self.params = self.model.init(jax.random.key(cfg.train.seed))
        self.opt = make_optimizer(cfg.train.learning_rate, cfg.train.grad_clip_norm)
        self.opt_state = self.opt.init(self.params)
        self.csr = DeviceCSR.from_dataset(g)
        self._key = jax.random.key(cfg.train.seed + 1)
        self.epoch_losses: List[float] = []
        self.lr_scale = 1.0
        # full-graph training: the reference sets num_batches_per_epoch=1
        # (node_train_utils.py:199) so StepLR(step_size=1) decays on every
        # plateau epoch — unlike the graph-level trainers.
        self.sched = PlateauStepLR(
            1, cfg.train.lr_decay_gamma, cfg.train.plateau_window
        )

        # one static whole-graph batch; neighborhoods resample on device
        self.batch = whole_dataset_batch(
            g, cfg.data.num_neighbors, pad_multiple=cfg.data.pad_multiple,
            seed=cfg.data.seed,
        )
        self.adj_mask = None
        if cfg.model.loss_type in ("gae", "contrastive"):
            # dense target adjacency, padded — GAE weight/norm prep analogue
            # (node_train_utils.py:23-38)
            self.adj_mask = jnp.asarray(ds.dense_adj(self.batch.n_pad))

        model, opt, spec, adj_mask = self.model, self.opt, self.spec, self.adj_mask
        K = cfg.data.num_neighbors
        total_nodes = g.num_nodes
        is_u2gnn = cfg.model.model.startswith("u2gnn")
        sampler_neighbor = cfg.model.sampler_type == "neighbor"

        @partial(jax.jit, donate_argnums=(0, 1))
        def _train_step(params, opt_state, batch: GraphBatch, key, csr):
            k_samp, k_cand, k_drop = jax.random.split(key, 3)
            neigh = resample_batch_neighbors(
                k_samp, csr, batch.node_gidx, batch.node_mask, K, total_nodes
            )
            batch = dataclasses.replace(batch, neigh=neigh)

            def loss_fn(p):
                if is_u2gnn:
                    return model.loss(
                        p, batch, k_cand, spec, rng=k_drop,
                        adj_mask=adj_mask,
                        csr=csr if sampler_neighbor else None,
                    )
                return model.loss(
                    p, batch, k_cand, spec, rng=k_drop, adj_mask=adj_mask
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss

        self._train_step = _train_step

    def train_epoch(self) -> float:
        """One full-graph step with fresh neighborhood samples — the
        reference resamples the whole graph every step
        (``node_train_utils.py:106-126``)."""
        self._key, sub = jax.random.split(self._key)
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, self.batch, sub, self.csr
        )
        loss = float(loss)
        self.epoch_losses.append(loss)
        new_scale = self.sched.update(self.epoch_losses)
        if new_scale != self.lr_scale:
            self.lr_scale = new_scale
            self.opt_state = set_lr_scale(self.opt_state, self.lr_scale)
        return loss

    # ---------------------------------------------------------------- embed
    def node_embeddings(self) -> np.ndarray:
        """[N, D] evaluation embeddings: the learned output-embedding table
        for the sampled-softmax head (``node_train_utils.py:219-231``
        evaluates ``model.ss.weight`` / ``model.weight``), the deterministic
        encoder output for the GAE / contrastive heads."""
        n = self.ds.num_nodes
        if self.cfg.model.loss_type == "default":
            if hasattr(self.model, "node_embeddings"):
                emb = self.model.node_embeddings(self.params)
            else:  # gcn/gat: the sampled-softmax output table [V, D]
                emb = self.params.ss.weight
            return np.asarray(emb)[:n]
        if hasattr(self.params, "weight") and self.params.weight is not None:
            return np.asarray(self.params.weight)[:n]
        out = self.model.encode(self.params, self.batch, rng=None)
        z = out[0] if isinstance(out, tuple) else out
        return np.asarray(z)[:n]

    # ----------------------------------------------------------------- eval
    def evaluate_masks(self) -> float:
        """Logistic probe on the dataset's train/test masks."""
        emb = self.node_embeddings()
        tr = np.where(self.ds.train_mask)[0]
        te = np.where(self.ds.test_mask)[0]
        return logistic_regression_probe(emb, self.ds.node_labels, tr, te)

    def evaluate_2fold(self, seed: int = 0) -> float:
        """Mean accuracy of a 2-fold logistic-regression probe over all
        nodes (``node_train_utils.py:251-277``)."""
        from sklearn.model_selection import StratifiedKFold

        emb = self.node_embeddings()
        y = self.ds.node_labels
        skf = StratifiedKFold(n_splits=2, shuffle=True, random_state=seed)
        accs = [
            logistic_regression_probe(emb, y, tr, te)
            for tr, te in skf.split(emb, y)
        ]
        return float(np.mean(accs))

    def evaluate_kmeans(self) -> Dict[str, float]:
        """Clustering metrics of kmeans on the embeddings
        (``ml_node_train_utils.py:362-371`` — shared with the node path)."""
        return eval_from_embeddings(
            self.node_embeddings(), self.ds.node_labels, self.ds.num_classes
        )


def train_evaluate_node(
    ds: NodeGraphDataset,
    cfg: ExperimentConfig,
    eval_mode: str = "masks",  # masks | 2fold | kmeans
    log_fn=print,
) -> Dict[str, object]:
    trainer = NodeTrainer(ds, cfg)
    history = []
    best = -1.0
    for epoch in range(1, cfg.train.num_epochs + 1):
        t0 = time.time()
        loss = trainer.train_epoch()
        metric = float("nan")
        if epoch % cfg.train.eval_every == 0:
            if eval_mode == "masks":
                metric = trainer.evaluate_masks()
            elif eval_mode == "2fold":
                metric = trainer.evaluate_2fold()
            else:
                metric = trainer.evaluate_kmeans()["accuracy"]
            best = max(best, metric)
        dt = time.time() - t0
        history.append({"epoch": epoch, "loss": loss, "metric": metric, "sec": dt})
        log_fn(
            f"epoch {epoch:03d} | loss {loss:12.4f} | {eval_mode} {metric:.4f} | {dt:.2f}s"
        )
    return {"history": history, "best_metric": best, "trainer": trainer}
