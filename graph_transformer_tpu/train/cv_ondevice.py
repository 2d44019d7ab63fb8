"""Entire k-fold cross-validation as ONE device program.

Composition of every TPU-native piece in the stack:

  vmap over folds
    × lax.scan over epochs
        × lax.scan over train steps
            (on-device graph selection → on-device batch gather
             (``data/device_batcher.py``) → on-device neighborhood
             resampling → fwd/bwd → Adam)
        + in-scan test-fold eval (best-epoch accuracy carry)
        + in-scan plateau LR decay (reference StepLR semantics,
          ``train_pytorch_U2GNN_Sup.py:209-210``)

The host uploads the dataset once, pre-builds the (static) eval batches,
then launches a single dispatch that returns per-fold best accuracies —
the number the U2GNN paper's tables report.  Against the per-epoch vmapped
runner (``train/tenfold_vmap.py``) this removes the last host work: the
~45k per-batch numpy assemblies of a full CV (the 2-core host was the
bottleneck; the chip idled between epochs).

Protocol equivalence with the sequential/vmapped runners (same folds, same
padding, same best-epoch metric, same plateau rule) — but a different RNG
architecture (graph selection moves from numpy to ``jax.random``), so runs
are statistically, not bit-for-bit, identical.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from graph_transformer_tpu.config import ExperimentConfig
from graph_transformer_tpu.data.batching import BatchBuilder
from graph_transformer_tpu.data.device_batcher import DeviceDataset, assemble_batch
from graph_transformer_tpu.data.splits import stratified_kfold_indices
from graph_transformer_tpu.data.tu import GraphDataset
from graph_transformer_tpu.models.u2gnn_sup import U2GNNSup
from graph_transformer_tpu.ops.losses import label_smoothing, soft_cross_entropy
from graph_transformer_tpu.sampling.neighbors import DeviceCSR, resample_batch_neighbors
from graph_transformer_tpu.sampling.pallas_sampler import (
    build_neighbor_table,
    resample_batch_neighbors_fast,
)
from graph_transformer_tpu.train.optim import make_optimizer

_BIG = jnp.asarray(3.0e38, jnp.float32)  # plateau-history fill (never fires)


def _stack_trees(trees):
    return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *trees)


def run_cv_on_device(
    ds: GraphDataset,
    cfg: ExperimentConfig,
    num_folds: int = 10,
    folds: Optional[List[Tuple[np.ndarray, np.ndarray]]] = None,
    return_history: bool = False,
    mesh: Optional[jax.sharding.Mesh] = None,
    fold_axis: str = "data",
    epochs_per_dispatch: Optional[int] = None,
    checkpoint_dir: Optional[str] = None,
):
    """Full CV on device; returns ``(best_accs [F], mean, std)``
    (plus ``(epoch_losses, epoch_accs)`` histories [epochs, F] when
    ``return_history``).

    ``epochs_per_dispatch`` bounds the length of one device program: the
    epoch scan is chunked, with the training carry staying on device between
    dispatches (donated — no host round trips).  Default: sized so one
    dispatch covers ~1200 fold-vmapped train steps.  Rationale: this
    environment's remote-TPU relay kills the worker on single dispatches
    that run many minutes (observed: MUTAG's ~170 s whole-CV dispatch fine,
    PTC's longer one reproducibly fatal); on directly-attached chips a large
    value restores the one-dispatch behavior.

    ``mesh``: optional device mesh — the fold axis is sharded over
    ``fold_axis`` (embarrassingly parallel, no cross-fold collectives), the
    dataset/CSR replicated."""
    # use_pallas is fold-vmappable: the kernels take their dropout seed as a
    # regular (1,1) SMEM input (ops/pallas_ffn._seed_arr), so vmap folds the
    # fold axis into the kernel grid instead of serializing.
    if folds is None:
        folds = stratified_kfold_indices(ds.labels, num_folds, seed=0)
    F = len(folds)
    B = cfg.data.batch_size
    K = cfg.data.num_neighbors
    W = cfg.train.plateau_window
    gamma = cfg.train.lr_decay_gamma
    num_classes = ds.num_classes
    smoothing = cfg.model.label_smoothing
    total_nodes = ds.num_nodes

    # ---- host prep: fold id tables, eval stacks, dataset upload (once) ----
    builders = [
        BatchBuilder(
            ds,
            batch_size=B,
            num_neighbors=K,
            pad_multiple=cfg.data.pad_multiple,
            seed=cfg.data.seed,
            indices=tr,
        )
        for tr, _ in folds
    ]
    n_pad = builders[0].n_pad
    steps = max(max(1, (len(tr) + B - 1) // B) for tr, _ in folds)

    g_max = max(len(tr) for tr, _ in folds)
    train_ids = np.zeros((F, g_max), np.int32)
    train_p = np.zeros((F, g_max), np.float32)
    for f, (tr, _) in enumerate(folds):
        train_ids[f, : len(tr)] = tr
        train_p[f, : len(tr)] = 1.0 / len(tr)

    # eval stacks: deterministic padded batches per fold (host neigh draws,
    # exactly as the other runners' cached eval stacks)
    per_fold, per_mask = [], []
    for builder, (_, te) in zip(builders, folds):
        batches, masks = [], []
        for batch, n_real in builder.eval_batches(te):
            batches.append(batch)
            m = np.zeros(batch.labels.shape[0], np.float32)
            m[:n_real] = 1.0
            masks.append(m)
        per_fold.append(batches)
        per_mask.append(masks)
    nb = max(len(b) for b in per_fold)
    for batches, masks in zip(per_fold, per_mask):
        while len(batches) < nb:
            batches.append(batches[-1])
            masks.append(np.zeros_like(masks[-1]))
    eval_b = _stack_trees([_stack_trees(b) for b in per_fold])  # [F, nb, ...]
    eval_m = np.stack([np.stack(m) for m in per_mask])  # [F, nb, B]
    counts = np.asarray([len(te) for _, te in folds], np.float32)  # [F]

    dd = DeviceDataset.from_dataset(ds)
    csr = DeviceCSR.from_dataset(ds) if cfg.train.on_device_sampling else None
    if csr is None:
        raise ValueError("run_cv_on_device requires on_device_sampling")

    # Fast sampling path (same gate as SupTrainer): fold-vmappable Pallas
    # PRNG+lane-gather sampling of global ids + global feature gather.
    nbr_table = deg_dev = x_global = None
    if jax.default_backend() == "tpu":
        tb = build_neighbor_table(ds, hub_seed=cfg.train.seed)
        if tb is not None:
            nbr_table = jnp.asarray(tb)
            deg_dev = jnp.asarray(ds.degrees, jnp.int32)
            x_global = jnp.asarray(
                ds.node_feat, jnp.dtype(cfg.model.compute_dtype)
            )
            if mesh is not None:
                rep = jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec()
                )
                nbr_table = jax.device_put(nbr_table, rep)
                deg_dev = jax.device_put(deg_dev, rep)
                x_global = jax.device_put(x_global, rep)
    fast = nbr_table is not None

    model = U2GNNSup(ds.feature_dim, ds.num_classes, cfg.model)
    params0 = model.init(jax.random.key(cfg.train.seed))
    opt = make_optimizer(cfg.train.learning_rate, cfg.train.grad_clip_norm)
    opt_state0 = opt.init(params0)
    # materialized (not lazy-broadcast) so the jit can donate the buffers
    params_f = jax.tree_util.tree_map(
        lambda x: jnp.tile(x[None], (F,) + (1,) * x.ndim), params0
    )
    opt_f = jax.tree_util.tree_map(
        lambda x: jnp.tile(jnp.asarray(x)[None], (F,) + (1,) * jnp.ndim(x)),
        opt_state0,
    )

    num_epochs = cfg.train.num_epochs
    if epochs_per_dispatch is None:
        # budget in graph-steps (steps × batch), not steps: a batch-16 step
        # does 4× a batch-4 step's work, and the relay's dispatch limit is
        # wall-clock (observed: NCI1 at 5 epochs × 232 steps × bs16 per
        # dispatch crashed the worker; MUTAG at 25 × 43 × bs4 was fine)
        epochs_per_dispatch = max(1, 4800 // max(1, steps * B))
    epochs_per_dispatch = min(epochs_per_dispatch, num_epochs)
    # exact division: the scan length is static, so a ragged last chunk
    # would either recompile or train past num_epochs — use the largest
    # divisor of num_epochs within the target instead
    epochs_per_dispatch = max(
        d for d in range(1, epochs_per_dispatch + 1) if num_epochs % d == 0
    )

    # ----------------------- the chunked device program -------------------
    def per_fold_chunk(params, opt_state, best, hist, n_plateau, e0,
                       ids, p_sel, ebs, emask, n_test, key):
        def epoch_body(carry, e):
            params, opt_state, best, hist, n_plateau = carry
            ekey = jax.random.fold_in(key, e)

            def step(c, i):
                p, s = c
                sk = jax.random.fold_in(ekey, i)
                k_sel, k_samp, k_drop = jax.random.split(sk, 3)
                gids = jax.random.choice(
                    k_sel, ids, (B,), replace=False, p=p_sel
                )
                b = assemble_batch(dd, gids, n_pad)
                nf = ng = None
                if fast:
                    seed = jax.random.randint(
                        k_samp, (1,), 0, 2**31 - 1, jnp.int32
                    )
                    ng = resample_batch_neighbors_fast(
                        seed, nbr_table[b.node_gidx],
                        deg_dev[b.node_gidx][:, None], b.node_gidx, K,
                    )
                    nf = x_global[ng]
                else:
                    neigh = resample_batch_neighbors(
                        k_samp, csr, b.node_gidx, b.node_mask, K, total_nodes
                    )
                    b = dataclasses.replace(b, neigh=neigh)

                def loss_fn(pp):
                    scores = model.apply(
                        pp, b, rng=k_drop, neigh_feat=nf,
                        neigh_global=ng, num_total_nodes=total_nodes,
                    )
                    targets = label_smoothing(b.labels, num_classes, smoothing)
                    return soft_cross_entropy(scores, targets)

                loss, grads = jax.value_and_grad(loss_fn)(p)
                updates, s = opt.update(grads, s, p)
                p = jax.tree_util.tree_map(lambda a, u: a + u, p, updates)
                return (p, s), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), jnp.arange(steps)
            )
            epoch_loss = jnp.sum(losses)

            # plateau-gated StepLR: the plateau condition (epoch > W and
            # loss > mean(prev W)) triggers a scheduler .step(); the LR
            # decays only once per `steps` (= batches/epoch) accumulated
            # steps — torch StepLR(step_size=num_batches_per_epoch)
            # semantics (train_pytorch_U2GNN_Sup.py:146-147,209-210;
            # see optim.PlateauStepLR).
            fired = (e >= W) & (epoch_loss > jnp.mean(hist))
            n_plateau = n_plateau + fired.astype(jnp.int32)
            scale = jnp.power(
                jnp.asarray(gamma, jnp.float32),
                (n_plateau // steps).astype(jnp.float32),
            )
            opt_state = opt_state._replace(
                hyperparams={**opt_state.hyperparams, "lr_scale": scale}
            )
            hist = jnp.roll(hist, -1).at[-1].set(epoch_loss)

            # test-fold eval (deterministic forward)
            def fwd(b):
                return model.apply(params, b, rng=None)

            scores = jax.lax.map(fwd, ebs)  # [nb, B, C]
            pred = jnp.argmax(scores, axis=-1)
            acc = jnp.sum((pred == ebs.labels) * emask) / n_test
            best = jnp.maximum(best, acc)
            return (params, opt_state, best, hist, n_plateau), (epoch_loss, acc)

        carry = (params, opt_state, best, hist, n_plateau)
        carry, (eloss, eacc) = jax.lax.scan(
            epoch_body, carry, e0 + jnp.arange(epochs_per_dispatch)
        )
        return carry + (eloss, eacc)

    # donate the training carry so chunks alias buffers in place
    @partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4))
    def cv_chunk(params_f, opt_f, best_f, hist_f, npl_f, e0,
                 ids_f, p_f, ebs_f, em_f, n_f, key):
        return jax.vmap(
            per_fold_chunk,
            in_axes=(0, 0, 0, 0, 0, None, 0, 0, 0, 0, 0, None),
        )(params_f, opt_f, best_f, hist_f, npl_f, e0,
          ids_f, p_f, ebs_f, em_f, n_f, key)

    fold_args = (train_ids, train_p, eval_b, eval_m, counts)
    key = jax.random.key(cfg.train.seed + 1)
    hist_f = np.full((F, W), np.float32(3.0e38))
    best_f = np.zeros((F,), np.float32)
    npl_f = np.zeros((F,), np.int32)
    carry = (params_f, opt_f, best_f, hist_f, npl_f)
    if mesh is not None:
        if F % mesh.shape[fold_axis] != 0:
            raise ValueError(
                f"fold count {F} must divide evenly over mesh axis "
                f"{fold_axis!r} ({mesh.shape[fold_axis]} devices)"
            )
        shard = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(fold_axis)
        )
        rep = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
        fold_args = tuple(jax.device_put(a, shard) for a in fold_args)
        carry = tuple(jax.device_put(a, shard) for a in carry)
        key = jax.device_put(key, rep)
        dd = jax.device_put(dd, rep)
        csr = jax.device_put(csr, rep)

    elosses, eaccs = [], []
    n_chunks = (num_epochs + epochs_per_dispatch - 1) // epochs_per_dispatch
    chunk0 = 0
    ckpt_dir = checkpoint_dir or cfg.train.checkpoint_dir
    if ckpt_dir:
        # preemption-safe sweeps: the whole CV carry snapshots at every
        # chunk boundary; a restarted process resumes mid-CV and reproduces
        # the uninterrupted result bit-for-bit (RNG keys derive from the
        # absolute epoch index, not from resume-relative state).
        from graph_transformer_tpu.train.checkpoint import (
            latest_checkpoint,
            restore_checkpoint,
        )

        path = latest_checkpoint(ckpt_dir)
        if path is not None:
            params_r, opt_r, extra = restore_checkpoint(
                path, carry[0], carry[1]
            )
            chunk0 = int(extra["chunk"])
            carry = (
                params_r,
                opt_r,
                jnp.asarray(extra["best_f"], jnp.float32),
                jnp.asarray(extra["hist_f"], jnp.float32),
                jnp.asarray(extra["npl_f"], jnp.int32),
            )
            if mesh is not None:
                carry = tuple(jax.device_put(a, shard) for a in carry)
            elosses = [np.asarray(a, np.float32)
                       for a in extra["elosses"]]
            eaccs = [np.asarray(a, np.float32) for a in extra["eaccs"]]
    for c in range(chunk0, n_chunks):
        e0 = jnp.asarray(c * epochs_per_dispatch, jnp.int32)
        out = cv_chunk(*carry, e0, *fold_args, key)
        carry = out[:5]
        # fetch the chunk's summaries (cheap) — also a completion barrier,
        # so each dispatch stays bounded
        elosses.append(np.asarray(out[5]))
        eaccs.append(np.asarray(out[6]))
        if ckpt_dir and c < n_chunks - 1:
            from graph_transformer_tpu.train.checkpoint import save_checkpoint

            save_checkpoint(
                ckpt_dir,
                c + 1,
                jax.device_get(carry[0]),
                jax.device_get(carry[1]),
                extra={
                    "chunk": c + 1,
                    "best_f": np.asarray(carry[2]),
                    "hist_f": np.asarray(carry[3]),
                    "npl_f": np.asarray(carry[4]),
                    "elosses": [a.tolist() for a in elosses],
                    "eaccs": [a.tolist() for a in eaccs],
                },
            )
            if mesh is not None:
                # device_get pulled the donated carry to host; re-shard
                carry = tuple(
                    jax.device_put(a, shard) for a in carry
                )
    best = np.asarray(carry[2])
    eloss = np.concatenate(elosses, axis=1)[:, :num_epochs]
    eacc = np.concatenate(eaccs, axis=1)[:, :num_epochs]
    if return_history:
        return (
            best,
            float(best.mean()),
            float(best.std()),
            np.asarray(eloss).T,
            np.asarray(eacc).T,
        )
    return best, float(best.mean()), float(best.std())
