"""Node-embedding trainer for multiplex (and single-view) graphs.

Capability parity with ``ml_node_train_utils.py`` / ``node_train_utils.py`` /
``run_node_classification.py``: transductive training of the multilayer
siamese/multi U2GNN (or a single-view model) over a full multiplex graph,
fresh per-step neighborhood resampling (``ml_node_train_utils.py:179-206``),
contrastive/GAE losses over the global node-embedding table, evaluation by
logistic-regression probe on train/test masks (``:342-360``) or
kmeans clustering metrics (``:362-371``), plus the spectral baselines —
arithmetic-mean vs Riemannian geometric-mean Laplacian
(``run_node_classification.py:62-65``).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import numpy as np

from graph_transformer_tpu.config import ExperimentConfig
from graph_transformer_tpu.data.multiplex import MultiplexDataset
from graph_transformer_tpu.models.multilayer import (
    MultilayerU2GNN,
    build_multiplex_batch,
)
from graph_transformer_tpu.train.evaluate import logistic_regression_probe
from graph_transformer_tpu.train.optim import (
    make_optimizer,
    PlateauStepLR,
    set_lr_scale,
)
from graph_transformer_tpu.utils.laplacian import (
    arithmetic_mean_laplacian,
    geometric_mean_laplacian,
)
from graph_transformer_tpu.utils.metrics import (
    eval_from_embeddings,
    spectral_eval_from_laplacian,
)


class MultiplexNodeTrainer:
    def __init__(self, ds: MultiplexDataset, cfg: ExperimentConfig):
        self.ds = ds
        self.cfg = cfg
        self.model = MultilayerU2GNN(
            feature_dim=ds.feature_dim,
            num_nodes=ds.num_nodes,
            num_views=ds.num_views,
            cfg=cfg.model,
        )
        self.params = self.model.init(jax.random.key(cfg.train.seed))
        self.opt = make_optimizer(cfg.train.learning_rate, cfg.train.grad_clip_norm)
        self.opt_state = self.opt.init(self.params)
        self._np_rng = np.random.default_rng(cfg.data.seed)
        self._key = jax.random.key(cfg.train.seed + 1)
        self.epoch_losses: List[float] = []
        self.lr_scale = 1.0
        # full-graph training: reference num_batches_per_epoch=1
        # (ml_node_train_utils.py:285) → StepLR(step_size=1) decays on
        # every plateau epoch.
        self.sched = PlateauStepLR(
            1, cfg.train.lr_decay_gamma, cfg.train.plateau_window
        )

        model, opt = self.model, self.opt

        @jax.jit
        def _train_step(params, opt_state, batch, key):
            def loss_fn(p):
                return model.loss(p, batch, rng=key)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss

        self._train_step = _train_step

    def train_epoch(self) -> float:
        """One full-graph step with fresh per-view neighborhood samples
        (the reference resamples the whole graph every step,
        ``ml_node_train_utils.py:305-325``)."""
        batch = build_multiplex_batch(
            self.ds.x, self.ds.adj, self.cfg.data.num_neighbors, self._np_rng
        )
        self._key, sub = jax.random.split(self._key)
        self.params, self.opt_state, loss = self._train_step(
            self.params, self.opt_state, batch, sub
        )
        loss = float(loss)
        self.epoch_losses.append(loss)
        new_scale = self.sched.update(self.epoch_losses)
        if new_scale != self.lr_scale:
            self.lr_scale = new_scale
            self.opt_state = set_lr_scale(self.opt_state, self.lr_scale)
        return loss

    def node_embeddings(self) -> np.ndarray:
        return np.asarray(self.model.node_embeddings(self.params))

    # ------------------------------------------------------------------ eval
    def evaluate_logistic(self) -> float:
        """Logistic probe on train/test masks (``ml_node_train_utils.py:
        342-360``)."""
        emb = self.node_embeddings()
        tr = np.where(self.ds.train_mask)[0]
        te = np.where(self.ds.test_mask)[0]
        return logistic_regression_probe(emb, self.ds.labels, tr, te)

    def evaluate_kmeans(self) -> Dict[str, float]:
        """Clustering metrics of kmeans on the embeddings
        (``ml_node_train_utils.py:362-371``)."""
        return eval_from_embeddings(
            self.node_embeddings(), self.ds.labels, self.ds.num_classes
        )

    def spectral_baselines(self) -> Dict[str, Dict[str, float]]:
        """Arithmetic-mean vs geometric-mean Laplacian spectral clustering
        (``run_node_classification.py:62-65``, ``util.py:43-52``)."""
        am = arithmetic_mean_laplacian(self.ds.lap)
        gm = geometric_mean_laplacian(self.ds.lap)
        k = self.ds.num_classes
        return {
            "arithmetic_mean": spectral_eval_from_laplacian(am, self.ds.labels, k),
            "geometric_mean": spectral_eval_from_laplacian(gm, self.ds.labels, k),
        }


def train_evaluate_multiplex(
    ds: MultiplexDataset,
    cfg: ExperimentConfig,
    eval_mode: str = "logistic",  # logistic | kmeans
    log_fn=print,
) -> Dict[str, object]:
    trainer = MultiplexNodeTrainer(ds, cfg)
    history = []
    best = -1.0
    for epoch in range(1, cfg.train.num_epochs + 1):
        t0 = time.time()
        loss = trainer.train_epoch()
        metric = float("nan")
        if epoch % cfg.train.eval_every == 0:
            if eval_mode == "logistic":
                metric = trainer.evaluate_logistic()
            else:
                metric = trainer.evaluate_kmeans()["accuracy"]
            best = max(best, metric)
        dt = time.time() - t0
        history.append({"epoch": epoch, "loss": loss, "metric": metric, "sec": dt})
        log_fn(f"epoch {epoch:03d} | loss {loss:10.4f} | {eval_mode} {metric:.4f} | {dt:.2f}s")
    return {"history": history, "best_metric": best, "trainer": trainer}
