"""Supervised graph-classification trainer.

One trainer replacing the reference's copy-pasted per-script loops
(``train_pytorch_U2GNN_Sup.py:149-213``, ``U2GNN_tf/train_U2GNN_Sup.py``).

TPU design: the train step is one jitted program — on-device neighborhood
resampling (CSR gathers, ``sampling/neighbors.py``) → forward → soft-label CE
→ grad → clipped Adam — with donated (params, opt_state).  The host only picks
``batch_size`` random graph ids per step and reuses cached padded batch
skeletons, so the per-step host cost is O(batch nodes) numpy instead of the
reference's pure-Python O(E + N·K) dict building.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from graph_transformer_tpu.config import ExperimentConfig
from graph_transformer_tpu.data.batching import BatchBuilder, GraphBatch
from graph_transformer_tpu.data.splits import separate_data_idx
from graph_transformer_tpu.data.tu import GraphDataset
from graph_transformer_tpu.models.u2gnn_sup import U2GNNSup
from graph_transformer_tpu.ops.losses import label_smoothing, soft_cross_entropy
from graph_transformer_tpu.sampling.neighbors import DeviceCSR, resample_batch_neighbors
from graph_transformer_tpu.sampling.pallas_sampler import (
    build_neighbor_table,
    resample_batch_neighbors_fast,
)
from graph_transformer_tpu.train.optim import (
    PlateauStepLR,
    make_optimizer,
    set_lr_scale,
)


class SupTrainer:
    """Supervised U2GNN trainer for one CV fold."""

    def __init__(
        self,
        ds: GraphDataset,
        cfg: ExperimentConfig,
        train_idx: Optional[np.ndarray] = None,
        test_idx: Optional[np.ndarray] = None,
    ):
        self.ds = ds
        self.cfg = cfg
        if train_idx is None or test_idx is None:
            train_idx, test_idx = separate_data_idx(ds.labels, cfg.data.fold_idx)
        self.train_idx, self.test_idx = train_idx, test_idx

        self.builder = BatchBuilder(
            ds,
            batch_size=cfg.data.batch_size,
            num_neighbors=cfg.data.num_neighbors,
            pad_multiple=cfg.data.pad_multiple,
            seed=cfg.data.seed,
            indices=train_idx,
        )
        self.model = U2GNNSup(ds.feature_dim, ds.num_classes, cfg.model)
        self.params = self.model.init(jax.random.key(cfg.train.seed))
        self.opt = make_optimizer(cfg.train.learning_rate, cfg.train.grad_clip_norm)
        self.opt_state = self.opt.init(self.params)
        self.csr = DeviceCSR.from_dataset(ds) if cfg.train.on_device_sampling else None
        # Fast sampling path: one Pallas PRNG+lane-gather pass instead of
        # XLA's ~1.3 ms of narrow gathers (sampling/pallas_sampler.py).
        # Applicable when every degree fits the 128-lane gather width.
        # Deeper stacks re-gather between layers through a global scratch
        # (ops.sparse.global_regather) since the fast sampler emits global,
        # not batch-local, neighbor ids.
        self.nbr_table = None
        self._tag_table = None
        if (
            cfg.train.on_device_sampling
            and jax.default_backend() == "tpu"
        ):
            tb = build_neighbor_table(ds, hub_seed=cfg.train.seed)
            if tb is not None:
                self.nbr_table = jnp.asarray(tb)
                self._deg_dev = jnp.asarray(ds.degrees, jnp.int32)
                self._x_global = jnp.asarray(
                    ds.node_feat, jnp.dtype(cfg.model.compute_dtype)
                )
                # Fully-fused sample+gather+encode (one kernel; codebook
                # feature datasets — ops/pallas_sampled_encoder.py)
                from graph_transformer_tpu.ops.pallas_sampled_encoder import (
                    fused_gate_ok,
                    setup_fused_tables,
                )

                if fused_gate_ok(cfg.model):
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
            1, (len(train_idx) + cfg.data.batch_size - 1) // cfg.data.batch_size
        )
        self.sched = PlateauStepLR(
            self.num_batches_per_epoch,
            cfg.train.lr_decay_gamma,
            cfg.train.plateau_window,
        )

        on_dev = cfg.train.on_device_sampling
        fast = self.nbr_table is not None
        nbr_table = self.nbr_table
        deg_dev = getattr(self, "_deg_dev", None)
        x_global = getattr(self, "_x_global", None)
        num_classes = ds.num_classes
        smoothing = cfg.model.label_smoothing
        act_w = (cfg.model.act_loss_weight
                 if cfg.model.recurrence == "act" else 0.0)
        K = cfg.data.num_neighbors
        total_nodes = ds.num_nodes
        model = self.model
        opt = self.opt


        fused_sampling = self._tag_table is not None
        tag_table = self._tag_table
        tags_dev = getattr(self, "_tags_dev", None)
        codebook = getattr(self, "_codebook", None)

        def _fast_rows(b):
            return nbr_table[b.node_gidx], deg_dev[b.node_gidx][:, None]

        def _fused_si(b):
            """(tag_rows, deg, self_tag, codebook) for the fused sampled
            encoder — one row gather per step, same cost class as
            _fast_rows."""
            return (
                tag_table[b.node_gidx],
                deg_dev[b.node_gidx][:, None],
                tags_dev[b.node_gidx][:, None],
                codebook,
            )

        def _resample(b, k_samp, csr, fr=None):
            """Fresh neighborhoods for one step: returns
            ``(batch, neigh_feat-or-None, neigh_global-or-None)`` — the fast
            path samples *global* ids in one Pallas pass and gathers
            features from the global table (no batch-local remap); the CSR
            path updates ``batch.neigh`` as before."""
            if not on_dev:
                return b, None, None
            if fast:
                rows, degb = _fast_rows(b) if fr is None else fr
                seed = jax.random.randint(
                    k_samp, (1,), 0, 2**31 - 1, jnp.int32
                )
                neigh_g = resample_batch_neighbors_fast(
                    seed, rows, degb, b.node_gidx, K
                )
                return b, x_global[neigh_g], neigh_g
            neigh = resample_batch_neighbors(
                k_samp, csr, b.node_gidx, b.node_mask, K, total_nodes
            )
            return dataclasses.replace(b, neigh=neigh), None, None

        @partial(jax.jit, donate_argnums=(0, 1))
        def _train_step(params, opt_state, batch: GraphBatch, key, csr):


            k_samp, k_drop = jax.random.split(key)
            if fused_sampling:
                nf = ng = None
                si = _fused_si(batch)
            else:
                batch, nf, ng = _resample(batch, k_samp, csr)
                si = None

            def loss_fn(p):
                scores, ponder = model.apply(
                    p, batch, rng=k_drop, return_ponder=True, neigh_feat=nf,
                    neigh_global=ng, num_total_nodes=total_nodes,
                    sampled_inputs=si,
                )
                targets = label_smoothing(batch.labels, num_classes, smoothing)
                # t2t act_loss (only nonzero for recurrence == "act")
                return soft_cross_entropy(scores, targets) + act_w * ponder

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss

        @jax.jit
        def _eval_scores(params, batch: GraphBatch):
            return model.apply(params, batch, rng=None)

        @partial(jax.jit, static_argnums=(4,), donate_argnums=(0, 1))
        def _train_scan(params, opt_state, batch: GraphBatch, key, n_steps, csr):
            """n_steps train steps as one device program (lax.scan): one
            dispatch, no per-step host round trips — the loop the TPU
            actually sees in production and what the bench measures.
            Neighborhoods resample on device every step."""


            # batch is fixed across the scan: its table rows gather ONCE
            fr = _fast_rows(batch) if (on_dev and fast and not fused_sampling) else None
            si = _fused_si(batch) if (on_dev and fused_sampling) else None

            def body(carry, i):
                p, s = carry
                step_key = jax.random.fold_in(key, i)
                k_samp, k_drop = jax.random.split(step_key)
                if si is not None:
                    b, nf, ng = batch, None, None
                else:
                    b, nf, ng = _resample(batch, k_samp, csr, fr)

                def loss_fn(pp):
                    scores, ponder = model.apply(
                        pp, b, rng=k_drop, return_ponder=True, neigh_feat=nf,
                        neigh_global=ng, num_total_nodes=total_nodes,
                        sampled_inputs=si,
                    )
                    targets = label_smoothing(b.labels, num_classes, smoothing)
                    return soft_cross_entropy(scores, targets) + act_w * ponder

                loss, grads = jax.value_and_grad(loss_fn)(p)
                updates, s = opt.update(grads, s, p)
                p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
                return (p, s), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(n_steps)
            )
            return params, opt_state, losses

        @partial(jax.jit, donate_argnums=(0, 1))
        def _train_scan_stacked(params, opt_state, batches: GraphBatch, key, csr):
            """One epoch as one device program: scan over a leading
            stacked-batch axis (host pre-builds the epoch's random graph
            subsets).  Each step still resamples neighborhoods on device.
            Collapses per-step dispatch latency — through this environment's
            remote-TPU relay that latency dominates small-batch training."""

            def body(carry, inp):
                p, s = carry
                b, i = inp
                step_key = jax.random.fold_in(key, i)
                k_samp, k_drop = jax.random.split(step_key)
                if fused_sampling:
                    nf = ng = None
                    si = _fused_si(b)
                else:
                    b, nf, ng = _resample(b, k_samp, csr)
                    si = None

                def loss_fn(pp):
                    scores, ponder = model.apply(
                        pp, b, rng=k_drop, return_ponder=True, neigh_feat=nf,
                        neigh_global=ng, num_total_nodes=total_nodes,
                        sampled_inputs=si,
                    )
                    targets = label_smoothing(b.labels, num_classes, smoothing)
                    return soft_cross_entropy(scores, targets) + act_w * ponder

                loss, grads = jax.value_and_grad(loss_fn)(p)
                updates, s = opt.update(grads, s, p)
                p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
                return (p, s), loss

            n = batches.labels.shape[0]
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (batches, jnp.arange(n))
            )
            return params, opt_state, jnp.sum(losses)

        @jax.jit
        def _eval_correct(params, batches: GraphBatch, real_mask):
            """Correct-prediction count over stacked eval batches — the whole
            test fold in one dispatch (``lax.map`` keeps peak memory at one
            batch's activations)."""

            def fwd(b):
                return model.apply(params, b, rng=None)

            scores = jax.lax.map(fwd, batches)  # [nb, B, C]
            pred = jnp.argmax(scores, axis=-1)
            return jnp.sum((pred == batches.labels) * real_mask)

        self._train_step = _train_step
        self._train_scan = _train_scan
        self._train_scan_stacked = _train_scan_stacked
        self._eval_scores = _eval_scores
        self._eval_correct = _eval_correct
        self._eval_stack = None  # lazy (stacked test batches, real mask)

    # ------------------------------------------------------------------ loops
    def train_epoch(self) -> float:
        """Run one epoch; returns the summed batch loss (the reference logs
        ``loss_accum`` summed over batches, ``train_pytorch_U2GNN_Sup.py:162``)."""
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

    def train_epoch_stacked(self) -> float:
        """:meth:`train_epoch` semantics in one device dispatch: pre-build
        the epoch's random batches on the host, stack, scan on device."""
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

    def evaluate(self, indices: Optional[np.ndarray] = None) -> float:
        """Argmax accuracy over ``indices`` (default: test fold),
        deterministic forward (``train_pytorch_U2GNN_Sup.py:166-187``).

        The default test fold is evaluated as one device dispatch over
        batches stacked once and cached."""
        if indices is None:
            if self._eval_stack is None:
                batches, masks = [], []
                for batch, n_real in self.builder.eval_batches(self.test_idx):
                    batches.append(batch)
                    m = np.zeros(batch.labels.shape[0], np.float32)
                    m[:n_real] = 1.0
                    masks.append(m)
                self._eval_stack = (
                    jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches),
                    np.stack(masks),
                )
            stacked, mask = self._eval_stack
            correct = int(self._eval_correct(self.params, stacked, mask))
            return correct / len(self.test_idx)
        correct = 0
        for batch, n_real in self.builder.eval_batches(indices):
            scores = np.asarray(self._eval_scores(self.params, batch))
            pred = scores[:n_real].argmax(axis=1)
            correct += int((pred == np.asarray(batch.labels)[:n_real]).sum())
        return correct / len(indices)


def train_evaluate_sup(
    ds: GraphDataset,
    cfg: ExperimentConfig,
    log_fn=print,
) -> Dict[str, object]:
    """Full train/eval loop for one fold; returns history + best accuracy."""
    trainer = SupTrainer(ds, cfg)
    history = []
    best_acc = 0.0
    for epoch in range(1, cfg.train.num_epochs + 1):
        t0 = time.time()
        loss = (
            trainer.train_epoch_stacked()
            if cfg.train.scan_epochs
            else trainer.train_epoch()
        )
        acc = (
            trainer.evaluate()
            if epoch % cfg.train.eval_every == 0
            else float("nan")
        )
        best_acc = max(best_acc, acc if acc == acc else 0.0)
        dt = time.time() - t0
        history.append({"epoch": epoch, "loss": loss, "test_acc": acc, "sec": dt})
        log_fn(
            f"epoch {epoch:03d} | loss {loss:10.2f} | acc {acc:.4f} | {dt:.2f}s"
        )
    return {"history": history, "best_acc": best_acc, "trainer": trainer}
