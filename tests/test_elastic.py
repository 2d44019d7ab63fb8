"""Elastic recovery (train/elastic.py): fault injection + bit-exact rejoin.

The reference has no failure handling (SURVEY.md §5); these tests prove the
new capability end-to-end: a CV run killed mid-sweep and supervised back to
life reproduces the uninterrupted result exactly.
"""

import numpy as np
import pytest

from graph_transformer_tpu.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from graph_transformer_tpu.data.splits import stratified_kfold_indices
from graph_transformer_tpu.train.cv_ondevice import run_cv_on_device
from graph_transformer_tpu.train.elastic import run_cv_elastic, run_elastic


class Boom(RuntimeError):
    pass


def test_run_elastic_retries_then_succeeds():
    calls = []

    def fn():
        calls.append(1)
        if len(calls) < 3:
            raise Boom("transient")
        return "done"

    seen = []
    out = run_elastic(
        fn, max_restarts=3, retryable=(Boom,),
        on_failure=lambda a, e: seen.append((a, str(e))),
    )
    assert out == "done" and len(calls) == 3
    assert seen == [(1, "transient"), (2, "transient")]


def test_run_elastic_exhausts_and_reraises():
    def fn():
        raise Boom("permanent")

    with pytest.raises(Boom):
        run_elastic(fn, max_restarts=2, retryable=(Boom,))


def test_run_elastic_does_not_catch_unretryable():
    def fn():
        raise KeyError("bug, not a fault")

    with pytest.raises(KeyError):
        run_elastic(fn, max_restarts=5, retryable=(Boom,))


def test_cv_elastic_requires_checkpoint_dir(mutag):
    with pytest.raises(ValueError, match="checkpoint_dir"):
        run_cv_elastic(mutag, None, "")


def test_fault_injected_cv_matches_uninterrupted(mutag, tmp_path, monkeypatch):
    """Kill the CV right after its first chunk snapshot (the realistic
    preemption point); the supervisor's retry resumes from the snapshot and
    the final accuracies match the uninterrupted run bit-for-bit."""
    pytest.importorskip("orbax.checkpoint")
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=8, num_neighbors=4),
        model=ModelConfig(num_timesteps=1, num_hidden_layers=1,
                          ff_hidden_size=32),
        train=TrainConfig(num_epochs=4, learning_rate=5e-4),
    )
    folds = stratified_kfold_indices(mutag.labels, 10, seed=0)[:2]

    ref_best, ref_mean, _ = run_cv_on_device(
        mutag, cfg, folds=folds, epochs_per_dispatch=2
    )

    from graph_transformer_tpu.train import checkpoint as ckpt_mod

    real_save = ckpt_mod.save_checkpoint
    fired = []

    def save_then_die(*args, **kwargs):
        path = real_save(*args, **kwargs)
        if not fired:
            fired.append(1)
            raise Boom("preempted right after the snapshot")
        return path

    monkeypatch.setattr(ckpt_mod, "save_checkpoint", save_then_die)
    attempts = []
    best, mean, std = run_cv_elastic(
        mutag, cfg, str(tmp_path / "ckpt"),
        folds=folds, epochs_per_dispatch=2,
        max_restarts=2, retryable=(Boom,),
        on_failure=lambda a, e: attempts.append(a),
    )
    assert attempts == [1]  # exactly one injected fault, one restart
    np.testing.assert_array_equal(best, ref_best)
    assert mean == ref_mean
