"""Fold-vmapped CV runner vs the sequential per-fold trainer.

The vmapped path must reproduce the sequential path exactly: same builders
(same seed, per-fold indices), same init, same per-epoch key chain — so
per-fold epoch losses and test accuracies should agree to float tolerance.
"""

import dataclasses

import numpy as np
import pytest

from graph_transformer_tpu.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from graph_transformer_tpu.data.splits import stratified_kfold_indices
from graph_transformer_tpu.train.sup_trainer import SupTrainer
from graph_transformer_tpu.train.tenfold_vmap import TenfoldVmapRunner


@pytest.fixture(scope="module")
def cfg():
    return ExperimentConfig(
        data=DataConfig(batch_size=8, num_neighbors=4),
        model=ModelConfig(num_timesteps=1, num_hidden_layers=1, ff_hidden_size=32),
        train=TrainConfig(num_epochs=3, learning_rate=5e-4),
    )


def test_vmap_matches_sequential(mutag, cfg):
    folds = stratified_kfold_indices(mutag.labels, 10, seed=0)[:3]
    runner = TenfoldVmapRunner(mutag, cfg, folds=folds)

    seq_losses, seq_accs = [], []
    for tr, te in folds:
        trainer = SupTrainer(mutag, cfg, train_idx=tr, test_idx=te)
        losses, best = [], 0.0
        for _ in range(cfg.train.num_epochs):
            losses.append(trainer.train_epoch_stacked())
            best = max(best, trainer.evaluate())
        seq_losses.append(losses)
        seq_accs.append(best)

    # sequential steps_per_epoch can differ by one from the vmapped max;
    # losses only comparable when equal
    comparable = all(
        max(1, (len(tr) + cfg.data.batch_size - 1) // cfg.data.batch_size)
        == runner.steps_per_epoch
        for tr, _ in folds
    )

    # interleave evaluate() exactly as the sequential loop does: eval-batch
    # neighborhoods draw from the same builder RNG, so the schedules must match
    vm_losses, best = [], np.zeros(len(folds))
    for _ in range(cfg.train.num_epochs):
        vm_losses.append(runner.train_epoch())
        best = np.maximum(best, runner.evaluate())

    if comparable:
        vm = np.stack(vm_losses).T  # [F, epochs]
        assert np.allclose(vm, np.asarray(seq_losses), rtol=2e-3, atol=2e-2)
    assert np.allclose(best, np.asarray(seq_accs), atol=1e-6)


def test_vmap_plateau_decay_is_per_fold(mutag, cfg):
    """Per-fold StepLR gating: a decay fires only once the fold accumulates
    step_size (= its batches/epoch) plateau steps; each fold counts its own
    (train_pytorch_U2GNN_Sup.py:146-147,209-210)."""
    folds = stratified_kfold_indices(mutag.labels, 10, seed=0)[:2]
    runner = TenfoldVmapRunner(mutag, cfg, folds=folds)
    # force a plateau on fold 0 only
    runner.epoch_losses[0] = [1.0] * 5 + [2.0]
    runner.epoch_losses[1] = [2.0] * 5 + [1.0]
    from graph_transformer_tpu.train.optim import plateau_lr_step

    assert plateau_lr_step(runner.epoch_losses[0], 5)
    assert not plateau_lr_step(runner.epoch_losses[1], 5)
    # pre-load fold 0's scheduler to one step below the decay boundary so
    # its next plateau epoch crosses it; fold 1 stays at zero steps
    runner.scheds[0].num_steps = runner.scheds[0].step_size - 1
    # make the upcoming epoch's loss a guaranteed plateau for fold 0
    runner.epoch_losses[0] = [-1e30] * 5
    runner.epoch_losses[1] = [1e30] * 5
    runner.train_epoch()
    scales = np.asarray(runner.opt_state.hyperparams["lr_scale"])
    assert scales[0] == pytest.approx(cfg.train.lr_decay_gamma)
    assert scales[1] == pytest.approx(1.0)
    # a single plateau step alone (fold 1 even if it fired) must NOT decay:
    # its counter is far below step_size
    assert runner.scheds[1].num_steps < runner.scheds[1].step_size


def test_vmap_folds_shard_over_mesh(mutag, cfg):
    """Fold axis sharded over a 2-device mesh reproduces the single-device
    vmapped run (GSPMD partitions the fold axis; no cross-fold collectives)."""
    import jax

    folds = stratified_kfold_indices(mutag.labels, 10, seed=0)[:2]
    base = TenfoldVmapRunner(mutag, cfg, folds=folds)
    base_accs, base_mean, _ = base.run(log_fn=None)

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), ("data",))
    sharded = TenfoldVmapRunner(mutag, cfg, folds=folds, mesh=mesh)
    accs, mean, _ = sharded.run(log_fn=None)

    assert np.allclose(accs, base_accs, atol=1e-6)
    assert mean == pytest.approx(base_mean, abs=1e-6)


def test_vmap_folds_mesh_divisibility(mutag, cfg):
    import jax

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]), ("data",))
    folds = stratified_kfold_indices(mutag.labels, 10, seed=0)[:3]
    with pytest.raises(ValueError):
        TenfoldVmapRunner(mutag, cfg, folds=folds, mesh=mesh)
