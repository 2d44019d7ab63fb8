"""Multiplex dataset / model / trainer tests."""

import numpy as np
import pytest

from graph_transformer_tpu.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from graph_transformer_tpu.data.multiplex import (
    MultiplexDataset,
    coincidence_digraph,
    gaussian_multiplex,
    knn_graph,
    load_multiplex,
    mat_multiview,
    raw_laplacian,
    shape_features,
    train_test_masks,
)
from graph_transformer_tpu.models.multilayer import batch_from_dataset
from graph_transformer_tpu.train.ml_node_trainer import (
    MultiplexNodeTrainer,
    train_evaluate_multiplex,
)

NGS_PATH = "/root/reference/code_m/data/NGs.mat"


def test_raw_laplacian_symmetric_case():
    a = np.array([[0, 1, 1], [1, 0, 0], [1, 0, 0]], float)
    lap = raw_laplacian(a)
    np.testing.assert_allclose(lap, np.diag([2, 1, 1]) - a)
    np.testing.assert_allclose(lap.sum(axis=1), 0, atol=1e-12)


def test_coincidence_digraph():
    a = coincidence_digraph(["y", "n", "y", "?"])
    assert a[0, 2] == 1 and a[2, 0] == 1
    assert a[0, 1] == 0
    assert a[0, 0] == 1  # self-coincidence kept (networkx self-loop)


def test_train_test_masks_disjoint():
    tr, te = train_test_masks(100, 0.6, np.random.default_rng(0))
    assert tr.sum() == 60 and te.sum() == 40
    assert not np.any(tr & te)


def test_shape_features_pca_and_pad(rng):
    x = rng.random((50, 20))
    assert shape_features(x, 8).shape == (50, 8)
    assert shape_features(x, 30).shape == (50, 30)
    assert shape_features(x, 20).shape == (50, 20)


def test_gaussian_multiplex_structure():
    ds = gaussian_multiplex(n=100, num_clusters=5, size_x=8, seed=100)
    assert ds.num_views == 4
    assert ds.num_nodes == 100
    assert ds.x.shape == (100, 10, 4)  # 2 signal dims + 8 random
    assert ds.num_classes == 5
    # adjacency symmetric binary
    for s in range(4):
        a = ds.adj[:, :, s]
        np.testing.assert_array_equal(a, a.T)
        assert set(np.unique(a)) <= {0.0, 1.0}
    # Laplacian rows sum to ~0
    np.testing.assert_allclose(ds.lap[:, :, 0].sum(axis=1), 0, atol=1e-9)


def test_registry_dispatch():
    ds = load_multiplex("gaussian", n=50, num_clusters=5)
    assert isinstance(ds, MultiplexDataset)
    with pytest.raises(KeyError):
        load_multiplex("nope")


def test_mat_multiview_ngs():
    """Real file: the NGs 3-view newsgroup data shipped in the reference."""
    import os

    if not os.path.exists(NGS_PATH):
        pytest.skip("NGs.mat unavailable")
    ds = mat_multiview(NGS_PATH, size_x=8)
    assert ds.num_nodes == 500
    assert ds.num_views == 3
    assert ds.num_classes == 5
    assert ds.x.shape == (500, 8, 3)


def test_multiplex_trainer_contrastive_decreases():
    ds = gaussian_multiplex(n=60, num_clusters=3, size_x=4, seed=1)
    cfg = ExperimentConfig(
        data=DataConfig(num_neighbors=2),
        model=ModelConfig(num_timesteps=1, ff_hidden_size=16,
                          loss_type="contrastive"),
        train=TrainConfig(num_epochs=1, learning_rate=1e-3),
    )
    t = MultiplexNodeTrainer(ds, cfg)
    losses = [t.train_epoch() for _ in range(8)]
    assert losses[-1] < losses[0]
    acc = t.evaluate_logistic()
    assert 0.0 <= acc <= 1.0
    m = t.evaluate_kmeans()
    assert "accuracy" in m


def test_spectral_baselines_separate_gaussian_clusters():
    ds = gaussian_multiplex(n=100, num_clusters=5, size_x=8, seed=100)
    cfg = ExperimentConfig(
        model=ModelConfig(num_timesteps=1, ff_hidden_size=8,
                          loss_type="contrastive"),
        train=TrainConfig(num_epochs=1),
        data=DataConfig(num_neighbors=2),
    )
    t = MultiplexNodeTrainer(ds, cfg)
    sp = t.spectral_baselines()
    assert sp["arithmetic_mean"]["accuracy"] > 0.6
    assert sp["geometric_mean"]["accuracy"] > 0.6


def test_batch_from_dataset_per_view_features():
    ds = gaussian_multiplex(n=40, num_clusters=4, size_x=2, seed=2)
    b = batch_from_dataset(ds, num_neighbors=3)
    assert b.x.shape == (4, 40, 4)
    assert b.neigh.shape == (4, 40, 4)
    # neighbors come from each view's own adjacency
    for s in range(4):
        a = ds.adj[:, :, s] > 0
        neigh = np.asarray(b.neigh[s])
        for v in range(0, 40, 7):
            allowed = set(np.nonzero(a[v])[0].tolist()) | {v}
            assert set(neigh[v].tolist()) <= allowed
