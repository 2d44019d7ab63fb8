"""Trainer integration tests (fast configs)."""

import numpy as np
import pytest

from graph_transformer_tpu.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from graph_transformer_tpu.train.optim import PlateauStepLR, plateau_lr_step
from graph_transformer_tpu.train.sup_trainer import SupTrainer
from graph_transformer_tpu.train.unsup_trainer import UnsupTrainer


def _cfg(**kw):
    return ExperimentConfig(
        data=DataConfig(dataset="MUTAG", batch_size=16, num_neighbors=4),
        model=ModelConfig(num_timesteps=1, num_hidden_layers=1, ff_hidden_size=32,
                          sampled_num=32),
        train=TrainConfig(num_epochs=3, **kw),
    )


def test_plateau_rule():
    assert not plateau_lr_step([5, 4, 3, 2, 1], window=5)  # too short
    assert plateau_lr_step([5, 4, 3, 2, 1, 9], window=5)
    assert not plateau_lr_step([5, 4, 3, 2, 1, 0.5], window=5)


def test_plateau_step_lr_gating():
    """torch StepLR(step_size=num_batches_per_epoch) semantics: the decay
    fires once per `step_size` plateau-triggered scheduler steps — NOT on
    every plateau epoch (train_pytorch_U2GNN_Sup.py:146-147,209-210)."""
    sched = PlateauStepLR(step_size=3, gamma=0.1, window=2)
    hist = [10.0, 10.0]
    assert sched.update(hist) == 1.0  # too short to fire
    # three consecutive plateau epochs -> three scheduler steps -> one decay
    hist.append(20.0)
    assert sched.update(hist) == 1.0  # 1 step, 1 // 3 == 0
    hist.append(30.0)
    assert sched.update(hist) == 1.0  # 2 steps
    hist.append(40.0)
    assert sched.update(hist) == pytest.approx(0.1)  # 3 steps -> decay
    # improving epoch: no step, scale unchanged
    hist.append(0.1)
    assert sched.update(hist) == pytest.approx(0.1)


def test_plateau_step_lr_never_fires_in_reference_regime():
    """With step_size = num_batches_per_epoch (e.g. 43 for a MUTAG fold at
    batch 4), a 50-epoch run can accumulate at most 45 plateau steps -> the
    LR never decays.  The reference effectively trains at constant LR."""
    sched = PlateauStepLR(step_size=43, gamma=0.1, window=5)
    hist = []
    for e in range(30):
        hist.append(float(100 + e))  # monotonically worse: plateau each epoch
        scale = sched.update(hist)
    assert scale == 1.0
    assert sched.num_steps == 30 - 5  # fires from epoch 6 on (len > window)


def test_sup_trainer_loss_decreases(mutag):
    t = SupTrainer(mutag, _cfg())
    l0 = t.train_epoch()
    for _ in range(3):
        l1 = t.train_epoch()
    assert l1 < l0
    acc = t.evaluate()
    assert 0.0 <= acc <= 1.0


def test_sup_trainer_host_sampling_path(mutag):
    t = SupTrainer(mutag, _cfg(on_device_sampling=False))
    loss = t.train_epoch()
    assert np.isfinite(loss)


def test_unsup_trainer_runs_and_evaluates(mutag):
    cfg = ExperimentConfig(
        data=DataConfig(dataset="MUTAG", batch_size=32, num_neighbors=4),
        model=ModelConfig(num_timesteps=1, num_hidden_layers=1,
                          ff_hidden_size=32, sampled_num=32),
        train=TrainConfig(num_epochs=1, learning_rate=1e-4),
    )
    t = UnsupTrainer(mutag, cfg)
    l0 = t.train_epoch()
    assert np.isfinite(l0)
    mean, std = t.evaluate()
    assert 0.3 <= mean <= 1.0


def test_sup_trainer_stacked_epoch_matches_semantics(mutag):
    t = SupTrainer(mutag, _cfg())
    l0 = t.train_epoch_stacked()
    losses = [t.train_epoch_stacked() for _ in range(3)]
    assert np.isfinite(l0) and np.all(np.isfinite(losses))
    assert losses[-1] < l0  # same objective decreases
    # stacked (cached device) eval is deterministic and agrees with the
    # per-batch host path on the SAME cached batches
    acc_dev = t.evaluate()
    assert t.evaluate() == acc_dev
    import jax

    stacked, mask = t._eval_stack
    correct = 0
    for i in range(mask.shape[0]):
        b = jax.tree_util.tree_map(lambda a: a[i], stacked)
        scores = np.asarray(t._eval_scores(t.params, b))
        pred = scores.argmax(axis=1)
        correct += int(((pred == np.asarray(b.labels)) * mask[i]).sum())
    assert abs(acc_dev - correct / len(t.test_idx)) < 1e-9


def test_train_evaluate_sup_scan_epochs(mutag):
    from graph_transformer_tpu.train.sup_trainer import train_evaluate_sup
    import dataclasses as dc

    cfg = _cfg()
    cfg = cfg.replace(train=dc.replace(cfg.train, scan_epochs=True, num_epochs=2))
    out = train_evaluate_sup(mutag, cfg, log_fn=lambda *_: None)
    assert len(out["history"]) == 2
    assert 0.0 <= out["best_acc"] <= 1.0


def test_unsup_trainer_stacked_epoch(mutag):
    t = UnsupTrainer(mutag, _cfg())
    l0 = t.train_epoch_stacked()
    l1 = t.train_epoch_stacked()
    assert np.isfinite(l0) and np.isfinite(l1)
    mean, std = t.evaluate()
    assert 0.0 <= mean <= 1.0


def test_id_symmetric_protocol():
    """ModelConfig.id_symmetric: (a) an identity-permutation loss equals
    the baseline loss bit-for-bit; (b) with a real permutation the
    evaluation table returns node v's trained row pi(v) in node order;
    (c) training runs end-to-end and the probe is finite."""
    import jax
    import jax.numpy as jnp

    from graph_transformer_tpu.config import (
        DataConfig, ExperimentConfig, ModelConfig, TrainConfig,
    )
    from graph_transformer_tpu.data.batching import BatchBuilder
    from graph_transformer_tpu.data.tu import load_tu_dataset
    from graph_transformer_tpu.models.u2gnn_unsup import U2GNNUnsup
    from graph_transformer_tpu.train.unsup_trainer import UnsupTrainer

    ds = load_tu_dataset("MUTAG")
    mcfg = ModelConfig(num_timesteps=1, num_hidden_layers=1,
                       ff_hidden_size=16, sampled_num=8)
    model = U2GNNUnsup(ds.feature_dim, ds.num_nodes, mcfg)
    params = model.init(jax.random.key(0))
    spec = model.spec()
    builder = BatchBuilder(ds, batch_size=4, num_neighbors=4, seed=0)
    batch = builder.sample()
    key = jax.random.key(1)
    base = model.loss(params, batch, key, spec, rng=None)
    ident = model.loss(params, batch, key, spec, rng=None,
                       vocab_perm=jnp.arange(ds.num_nodes, dtype=jnp.int32))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(ident))

    perm = jnp.asarray(
        np.random.default_rng(3).permutation(ds.num_nodes), jnp.int32)
    emb = np.asarray(model.node_embeddings(params, vocab_perm=perm))
    w = np.asarray(params.ss.weight)
    np.testing.assert_array_equal(emb, w[np.asarray(perm)])

    import dataclasses as _dc

    cfg = ExperimentConfig(
        data=DataConfig(batch_size=4, num_neighbors=4),
        model=_dc.replace(mcfg, id_symmetric=True),
        train=TrainConfig(num_epochs=1),
    )
    tr = UnsupTrainer(ds, cfg)
    loss = tr.train_epoch()
    mean, std = tr.evaluate()
    assert np.isfinite(loss) and 0.0 <= mean <= 1.0
