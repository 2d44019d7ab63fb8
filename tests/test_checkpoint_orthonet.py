"""Checkpoint round-trip and OrthoNet tests."""

import os

import jax
import numpy as np
import pytest

from graph_transformer_tpu.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from graph_transformer_tpu.models.orthonet import OrthoNet
from graph_transformer_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from graph_transformer_tpu.train.sup_trainer import SupTrainer
from graph_transformer_tpu.utils.laplacian import unnormalized_laplacian


def test_checkpoint_roundtrip(mutag, tmp_path):
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=8, num_neighbors=2),
        model=ModelConfig(num_timesteps=1, ff_hidden_size=16),
        train=TrainConfig(num_epochs=1),
    )
    t = SupTrainer(mutag, cfg)
    t.train_epoch()
    path = save_checkpoint(
        str(tmp_path), 1, t.params, t.opt_state,
        {"epoch": 1, "losses": np.asarray(t.epoch_losses)},
    )
    assert latest_checkpoint(str(tmp_path)) == path

    t2 = SupTrainer(mutag, cfg)
    p2, s2, extra = restore_checkpoint(path, t2.params, t2.opt_state)
    assert extra["epoch"] == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(t.params), jax.tree_util.tree_leaves(p2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_orthonet_learns_block_structure():
    """Two disconnected cliques: tr(YᵀLY) minimized by block-constant Y."""
    n = 20
    a = np.zeros((2 * n, 2 * n))
    a[:n, :n] = 1.0
    a[n:, n:] = 1.0
    np.fill_diagonal(a, 0.0)
    lap = unnormalized_laplacian(a)
    x = np.eye(2 * n, dtype=np.float32)
    net = OrthoNet(input_dim=2 * n, hidden_dim=32, output_dim=2,
                   epochs=400, lr=1e-3)
    net.fit(x, lap)
    assert net.history[-1] < net.history[0]
    emb = net.predict(x)
    assert emb.shape == (2 * n, 2)
    # orthogonalized outputs: YᵀY ≈ m²·I/... — columns are orthogonal
    gram = emb.T @ emb
    off = abs(gram[0, 1]) / np.sqrt(gram[0, 0] * gram[1, 1])
    assert off < 0.2
