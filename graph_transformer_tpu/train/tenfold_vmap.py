"""Fold-parallel k-fold cross-validation: all folds train as ONE device
program per epoch via ``jax.vmap`` over the fold axis.

Why this exists (TPU-native design, no reference equivalent): the reference
protocol is 10-fold CV at batch_size 4 (``README.md:37-39``), which puts a
few hundred padded nodes per step on a chip built for tens of thousands —
the MXU is idle and wall-clock is dominated by per-dispatch latency.  The
folds are embarrassingly parallel and share every static shape (padding is
computed from the whole dataset, ``data/batching.py``), so we stack
(params, opt_state, batches) along a leading fold axis and ``vmap`` the
stacked-epoch train scan and the cached test-fold eval.  One epoch of ALL
folds costs one dispatch and ~the same wall-clock as one fold's epoch.

Semantics match the sequential path (``cli/tenfold.py`` looping
:class:`~graph_transformer_tpu.train.sup_trainer.SupTrainer`) exactly:

- identical per-fold parameter init (the sequential path re-inits every fold
  from ``cfg.train.seed``, so folds legitimately share one init);
- identical per-fold batch streams (each fold's ``BatchBuilder`` is seeded
  with ``cfg.data.seed``, as each sequential ``SupTrainer`` is);
- identical per-epoch dropout/sampling keys (one chain from
  ``cfg.train.seed + 1``, as each sequential trainer holds);
- per-fold plateau LR decay: the injected ``lr_scale`` optimizer
  hyperparameter becomes a length-F vector under vmap, so each fold decays
  independently without recompiling (``train/optim.py``).

The only intentional deviation: folds whose train split yields fewer
batches per epoch than the largest fold's count train the extra batches
too — batches are independent random subsets drawn with replacement
(reference semantics, ``train_pytorch_U2GNN_Sup.py:121-126``), so this
adds at most one extra batch per epoch to ~half the folds.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from graph_transformer_tpu.config import ExperimentConfig
from graph_transformer_tpu.data.batching import BatchBuilder, GraphBatch
from graph_transformer_tpu.data.splits import stratified_kfold_indices
from graph_transformer_tpu.data.tu import GraphDataset
from graph_transformer_tpu.models.u2gnn_sup import U2GNNSup
from graph_transformer_tpu.ops.losses import label_smoothing, soft_cross_entropy
from graph_transformer_tpu.sampling.neighbors import DeviceCSR, resample_batch_neighbors
from graph_transformer_tpu.sampling.pallas_sampler import (
    build_neighbor_table,
    resample_batch_neighbors_fast,
)
from graph_transformer_tpu.train.optim import PlateauStepLR, make_optimizer


def _stack_trees(trees):
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)


class TenfoldVmapRunner:
    """Train/evaluate all CV folds simultaneously on one chip.

    ``run()`` returns the per-fold best-epoch test accuracies — the number
    the reference protocol reports (best test accuracy across epochs per
    fold, ``train_pytorch_U2GNN_Sup.py:201-213``).
    """

    def __init__(
        self,
        ds: GraphDataset,
        cfg: ExperimentConfig,
        num_folds: int = 10,
        folds: Optional[List[Tuple[np.ndarray, np.ndarray]]] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        fold_axis: str = "data",
        val_fraction: float = 0.0,
    ):
        """``mesh``: optional device mesh; the fold axis is sharded over
        ``mesh.axis_names[…fold_axis]`` so folds run on distinct chips
        (GSPMD partitions the vmapped program — there is no cross-fold
        communication, so scaling is embarrassingly parallel over ICI).

        ``val_fraction`` > 0 carves a stratified validation subset out of
        each fold's TRAIN indices (training uses the remainder) for
        epoch-selection protocols — see ``scripts/ptc_protocol.py``."""
        # use_pallas is fold-vmappable since the kernels take their dropout
        # seed as a regular (1,1) input (ops/pallas_ffn._seed_arr): the vmap
        # axis becomes a leading grid dimension instead of hitting jax's
        # sequential scalar-prefetch fallback.
        self.ds = ds
        self.cfg = cfg
        self.folds = (
            stratified_kfold_indices(ds.labels, num_folds, seed=0)
            if folds is None
            else folds
        )
        self.val_sets: Optional[List[np.ndarray]] = None
        if val_fraction > 0.0:
            rng = np.random.default_rng(cfg.train.seed + 7919)
            new_folds, vals = [], []
            for tr, te in self.folds:
                tr = np.asarray(tr)
                val_idx = []
                for c in np.unique(ds.labels[tr]):
                    m = tr[ds.labels[tr] == c]
                    m = m[rng.permutation(len(m))]
                    k = max(1, int(round(val_fraction * len(m))))
                    val_idx.append(m[:k])
                val = np.concatenate(val_idx)
                keep = np.setdiff1d(tr, val)
                new_folds.append((keep, te))
                vals.append(val)
            self.folds, self.val_sets = new_folds, vals
        F = len(self.folds)
        self.num_folds = F

        self.builders = [
            BatchBuilder(
                ds,
                batch_size=cfg.data.batch_size,
                num_neighbors=cfg.data.num_neighbors,
                pad_multiple=cfg.data.pad_multiple,
                seed=cfg.data.seed,
                indices=tr,
            )
            for tr, _ in self.folds
        ]
        self.steps_per_epoch = max(
            max(1, (len(tr) + cfg.data.batch_size - 1) // cfg.data.batch_size)
            for tr, _ in self.folds
        )

        if mesh is not None and F % mesh.shape[fold_axis] != 0:
            raise ValueError(
                f"fold count {F} must divide evenly over mesh axis "
                f"{fold_axis!r} ({mesh.shape[fold_axis]} devices)"
            )
        self._fold_sharding = (
            jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec(fold_axis)
            )
            if mesh is not None
            else None
        )
        self._rep_sharding = (
            jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
            if mesh is not None
            else None
        )

        self.model = U2GNNSup(ds.feature_dim, ds.num_classes, cfg.model)
        params0 = self.model.init(jax.random.key(cfg.train.seed))
        opt = make_optimizer(cfg.train.learning_rate, cfg.train.grad_clip_norm)
        opt_state0 = opt.init(params0)
        # identical init replicated per fold (matches the sequential path,
        # which re-inits from the same seed every fold)
        # materialized (not lazy-broadcast) so the jit can donate the buffers
        self.params = self._shard(
            jax.tree_util.tree_map(
                lambda x: jnp.tile(x[None], (F,) + (1,) * x.ndim), params0
            )
        )
        self.opt_state = self._shard(
            jax.tree_util.tree_map(
                lambda x: jnp.tile(jnp.asarray(x)[None], (F,) + (1,) * jnp.ndim(x)),
                opt_state0,
            )
        )
        self.csr = (
            DeviceCSR.from_dataset(ds) if cfg.train.on_device_sampling else None
        )
        if mesh is not None and self.csr is not None:
            # fully replicated over the same device set as the fold shards
            self.csr = jax.device_put(
                self.csr,
                jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
            )
        self._key = jax.random.key(cfg.train.seed + 1)
        self.epoch_losses = [[] for _ in range(F)]
        self.lr_scales = np.ones(F, np.float32)
        # reference StepLR gating: step_size = the fold's own batches/epoch
        # (train_pytorch_U2GNN_Sup.py:146-147; see optim.PlateauStepLR)
        self.scheds = [
            PlateauStepLR(
                max(1, (len(tr) + cfg.data.batch_size - 1) // cfg.data.batch_size),
                cfg.train.lr_decay_gamma,
                cfg.train.plateau_window,
            )
            for tr, _ in self.folds
        ]

        on_dev = cfg.train.on_device_sampling
        num_classes = ds.num_classes
        smoothing = cfg.model.label_smoothing
        K = cfg.data.num_neighbors
        total_nodes = ds.num_nodes
        model = self.model

        # Fast sampling path (same gate as SupTrainer): one fold-vmappable
        # Pallas PRNG+lane-gather pass per step instead of the XLA CSR
        # gathers; features come pre-gathered from the global table.
        self.nbr_table = None
        if on_dev and jax.default_backend() == "tpu":
            tb = build_neighbor_table(ds, hub_seed=cfg.train.seed)
            if tb is not None:
                self.nbr_table = jnp.asarray(tb)
                self._deg_dev = jnp.asarray(ds.degrees, jnp.int32)
                self._x_global = jnp.asarray(
                    ds.node_feat, jnp.dtype(cfg.model.compute_dtype)
                )
                if mesh is not None:
                    rep = self._rep_sharding
                    self.nbr_table = jax.device_put(self.nbr_table, rep)
                    self._deg_dev = jax.device_put(self._deg_dev, rep)
                    self._x_global = jax.device_put(self._x_global, rep)
        # Fully-fused sample+gather+encode (shared gate with SupTrainer)
        self._tag_table = None
        if self.nbr_table is not None:
            from graph_transformer_tpu.ops.pallas_sampled_encoder import (
                fused_gate_ok,
                setup_fused_tables,
            )

            ft = (setup_fused_tables(ds.node_feat, tb)
                  if fused_gate_ok(cfg.model) else None)
            if ft is not None:
                tag_tb, tags_np, codebook_np = ft
                self._tag_table = jnp.asarray(tag_tb)
                self._tags_dev = jnp.asarray(tags_np)
                self._codebook = jnp.asarray(codebook_np)
                if mesh is not None:
                    rep = self._rep_sharding
                    self._tag_table = jax.device_put(self._tag_table, rep)
                    self._tags_dev = jax.device_put(self._tags_dev, rep)
                    self._codebook = jax.device_put(self._codebook, rep)
        fast = self.nbr_table is not None
        fused_sampling = self._tag_table is not None
        nbr_table = self.nbr_table
        tag_table = self._tag_table
        tags_dev = getattr(self, "_tags_dev", None)
        codebook = getattr(self, "_codebook", None)
        deg_dev = getattr(self, "_deg_dev", None)
        x_global = getattr(self, "_x_global", None)

        def _fold_epoch(params, opt_state, batches: GraphBatch, key, csr):
            """One fold's epoch: scan over its stacked batches (the same
            body as SupTrainer._train_scan_stacked)."""

            def body(carry, inp):
                p, s = carry
                b, i = inp
                step_key = jax.random.fold_in(key, i)
                k_samp, k_drop = jax.random.split(step_key)
                nf = ng = si = None
                if fused_sampling:
                    si = (
                        tag_table[b.node_gidx],
                        deg_dev[b.node_gidx][:, None],
                        tags_dev[b.node_gidx][:, None],
                        codebook,
                    )
                elif on_dev and fast:
                    seed = jax.random.randint(
                        k_samp, (1,), 0, 2**31 - 1, jnp.int32
                    )
                    ng = resample_batch_neighbors_fast(
                        seed, nbr_table[b.node_gidx],
                        deg_dev[b.node_gidx][:, None], b.node_gidx, K,
                    )
                    nf = x_global[ng]
                elif on_dev:
                    neigh = resample_batch_neighbors(
                        k_samp, csr, b.node_gidx, b.node_mask, K, total_nodes
                    )
                    b = dataclasses.replace(b, neigh=neigh)

                def loss_fn(pp):
                    scores = model.apply(
                        pp, b, rng=k_drop, neigh_feat=nf,
                        neigh_global=ng, num_total_nodes=total_nodes,
                        sampled_inputs=si,
                    )
                    targets = label_smoothing(b.labels, num_classes, smoothing)
                    return soft_cross_entropy(scores, targets)

                loss, grads = jax.value_and_grad(loss_fn)(p)
                updates, s = opt.update(grads, s, p)
                p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
                return (p, s), loss

            n = batches.labels.shape[0]
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (batches, jnp.arange(n))
            )
            return params, opt_state, jnp.sum(losses)

        @partial(jax.jit, donate_argnums=(0, 1))
        def _epoch_all_folds(params_f, opt_f, batches_f, key, csr):
            # key broadcast: every fold uses the same per-epoch key chain,
            # exactly as F sequential trainers seeded identically would.
            return jax.vmap(
                _fold_epoch, in_axes=(0, 0, 0, None, None)
            )(params_f, opt_f, batches_f, key, csr)

        @jax.jit
        def _eval_all_folds(params_f, ebatches_f, mask_f, labels_f):
            def one_fold(p, ebs, m, labels):
                def fwd(b):
                    return model.apply(p, b, rng=None)

                scores = jax.lax.map(fwd, ebs)  # [nb, B, C]
                pred = jnp.argmax(scores, axis=-1)
                return jnp.sum((pred == labels) * m)

            return jax.vmap(one_fold)(params_f, ebatches_f, mask_f, labels_f)

        @jax.jit
        def _eval_scores_all_folds(params_f, ebatches_f, mask_f, labels_f):
            def one_fold(p, ebs, m, labels):
                def fwd(b):
                    return model.apply(p, b, rng=None)

                scores = jax.lax.map(fwd, ebs)  # [nb, B, C]
                pred = jnp.argmax(scores, axis=-1)
                return jnp.sum((pred == labels) * m), scores

            return jax.vmap(one_fold)(params_f, ebatches_f, mask_f, labels_f)

        self._epoch_all_folds = _epoch_all_folds
        self._eval_all_folds = _eval_all_folds
        self._eval_scores_all_folds = _eval_scores_all_folds
        self._opt = opt
        self._eval_stack = None
        self._val_stack = None

    # ---------------------------------------------------------------- epochs
    def _shard(self, tree):
        """Lay the fold axis out over the mesh (no-op single-device)."""
        if self._fold_sharding is None:
            return tree
        return jax.device_put(tree, self._fold_sharding)

    def _build_epoch_batches(self) -> GraphBatch:
        """[F, steps, ...] stacked epoch batches (host, numpy)."""
        per_fold = []
        for builder in self.builders:
            bs = [builder.sample() for _ in range(self.steps_per_epoch)]
            per_fold.append(_stack_trees(bs))
        return self._shard(_stack_trees(per_fold))

    def _build_stack(self, idx_sets):
        """[F, nb, ...] stacked eval batches for arbitrary per-fold index
        sets (test folds or carved validation sets)."""
        per_fold, per_mask, counts = [], [], []
        for builder, idx in zip(self.builders, idx_sets):
            counts.append(len(idx))
            batches, masks = [], []
            for batch, n_real in builder.eval_batches(idx):
                batches.append(batch)
                m = np.zeros(batch.labels.shape[0], np.float32)
                m[:n_real] = 1.0
                masks.append(m)
            per_fold.append(batches)
            per_mask.append(masks)
        # pad fold eval-batch counts to the max (repeat last batch, zero mask)
        nb = max(len(b) for b in per_fold)
        for batches, masks in zip(per_fold, per_mask):
            while len(batches) < nb:
                batches.append(batches[-1])
                masks.append(np.zeros_like(masks[-1]))
        stacked = _stack_trees([_stack_trees(b) for b in per_fold])
        labels = np.asarray(stacked.labels)  # [F, nb, B]
        mask = np.stack([np.stack(m) for m in per_mask])  # [F, nb, B]
        return (
            self._shard(stacked),
            self._shard(mask),
            self._shard(labels),
            np.asarray(counts),
        )

    def _build_eval_stack(self):
        self._eval_stack = self._build_stack([te for _, te in self.folds])

    def train_epoch(self) -> np.ndarray:
        """One vmapped epoch across all folds; returns per-fold epoch loss."""
        batches_f = self._build_epoch_batches()
        self._key, sub = jax.random.split(self._key)
        if self._rep_sharding is not None:
            sub = jax.device_put(sub, self._rep_sharding)
        self.params, self.opt_state, losses = self._epoch_all_folds(
            self.params, self.opt_state, batches_f, sub, self.csr
        )
        losses = np.asarray(losses)
        decayed = False
        for f in range(self.num_folds):
            self.epoch_losses[f].append(float(losses[f]))
            new_scale = self.scheds[f].update(self.epoch_losses[f])
            if new_scale != self.lr_scales[f]:
                self.lr_scales[f] = new_scale
                decayed = True
        if decayed:
            self.opt_state.hyperparams["lr_scale"] = self._shard(
                jnp.asarray(self.lr_scales)
            )
        return losses

    def evaluate(self) -> np.ndarray:
        """Per-fold test accuracy, one dispatch for all folds."""
        if self._eval_stack is None:
            self._build_eval_stack()
        stacked, mask, labels, counts = self._eval_stack
        correct = np.asarray(
            self._eval_all_folds(self.params, stacked, mask, labels)
        )
        return correct / counts

    def evaluate_val(self) -> np.ndarray:
        """Per-fold accuracy on the carved validation sets
        (requires ``val_fraction > 0``)."""
        assert self.val_sets is not None, "construct with val_fraction > 0"
        if self._val_stack is None:
            self._val_stack = self._build_stack(self.val_sets)
        stacked, mask, labels, counts = self._val_stack
        correct = np.asarray(
            self._eval_all_folds(self.params, stacked, mask, labels)
        )
        return correct / counts

    def evaluate_scores(self) -> Tuple[np.ndarray, np.ndarray]:
        """(per-fold test accuracy [F], raw test scores [F, nb, B, C]) —
        the scores feed cross-seed ensembling (scripts/ptc_protocol.py)."""
        if self._eval_stack is None:
            self._build_eval_stack()
        stacked, mask, labels, counts = self._eval_stack
        correct, scores = self._eval_scores_all_folds(
            self.params, stacked, mask, labels
        )
        return np.asarray(correct) / counts, np.asarray(scores)

    def test_label_mask(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(labels [F, nb, B], mask [F, nb, B], counts [F]) of the test
        stack, for host-side ensembled-score accuracy."""
        if self._eval_stack is None:
            self._build_eval_stack()
        _, mask, labels, counts = self._eval_stack
        return np.asarray(labels), np.asarray(mask), counts

    def run(self, log_fn=print) -> Tuple[np.ndarray, float, float]:
        """Full CV: returns (per-fold best accuracies, mean, std)."""
        best = np.zeros(self.num_folds)
        for epoch in range(1, self.cfg.train.num_epochs + 1):
            losses = self.train_epoch()
            if epoch % self.cfg.train.eval_every == 0:
                best = np.maximum(best, self.evaluate())
            if log_fn is not None:
                log_fn(
                    f"epoch {epoch:03d} | mean loss {losses.mean():10.2f} | "
                    f"mean best acc {best.mean():.4f}"
                )
        return best, float(best.mean()), float(best.std())
