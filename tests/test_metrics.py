"""Metrics and Laplacian-mean tests."""

import numpy as np
import pytest

from graph_transformer_tpu.utils.laplacian import (
    arithmetic_mean_laplacian,
    geometric_mean_laplacian,
    unnormalized_laplacian,
)
from graph_transformer_tpu.utils.metrics import (
    clustering_accuracy,
    clustering_error_majority,
    eval_from_embeddings,
    purity,
    spectral_eval_from_laplacian,
)


def test_purity_perfect_and_mixed():
    y = np.array([0, 0, 1, 1])
    assert purity(y, np.array([1, 1, 0, 0])) == 1.0
    assert purity(y, np.array([0, 0, 0, 0])) == 0.5


def test_clustering_accuracy_permutation_invariant():
    y = np.array([0, 0, 1, 1, 2, 2])
    pred = np.array([2, 2, 0, 0, 1, 1])  # perfect up to relabeling
    assert clustering_accuracy(y, pred) == 1.0
    assert clustering_error_majority(y, pred) == 0.0


def test_unnormalized_laplacian():
    a = np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]], dtype=float)
    lap = unnormalized_laplacian(a)
    np.testing.assert_allclose(lap.sum(axis=1), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.diag(lap), [1, 2, 1])


def test_geometric_mean_identity_case():
    """Karcher mean of identical matrices is the matrix itself."""
    rng = np.random.default_rng(0)
    b = rng.standard_normal((6, 6))
    spd = b @ b.T + 6 * np.eye(6)
    stack = np.stack([spd - 10 * np.eye(6)] * 3, axis=2)  # reg adds it back
    gm = geometric_mean_laplacian(stack, reg=10.0)
    np.testing.assert_allclose(gm, spd, rtol=1e-6, atol=1e-8)


def test_geometric_mean_commuting_case():
    """For commuting SPD matrices the Karcher mean is the true geometric
    mean: diag matrices -> elementwise geometric mean of eigenvalues."""
    d1 = np.diag([1.0, 4.0, 9.0])
    d2 = np.diag([4.0, 1.0, 1.0])
    stack = np.stack([d1, d2], axis=2)
    gm = geometric_mean_laplacian(stack, reg=0.0)
    want = np.diag(np.sqrt(np.diag(d1) * np.diag(d2)))
    np.testing.assert_allclose(gm, want, rtol=1e-6, atol=1e-8)


def test_spectral_eval_recovers_blocks():
    """Two disconnected cliques → spectral clustering separates them."""
    n = 10
    a = np.zeros((2 * n, 2 * n))
    a[:n, :n] = 1.0
    a[n:, n:] = 1.0
    np.fill_diagonal(a, 0.0)
    lap = unnormalized_laplacian(a)
    y = np.repeat([0, 1], n)
    m = spectral_eval_from_laplacian(lap, y, 2)
    assert m["accuracy"] == 1.0
    assert m["purity"] == 1.0


def test_eval_from_embeddings_separable():
    rng = np.random.default_rng(1)
    x = np.concatenate([
        rng.normal(0, 0.05, (20, 4)),
        rng.normal(3, 0.05, (20, 4)),
    ])
    y = np.repeat([0, 1], 20)
    m = eval_from_embeddings(x, y, 2)
    assert m["accuracy"] == 1.0


def test_arithmetic_mean():
    stack = np.stack([np.eye(3), 3 * np.eye(3)], axis=2)
    np.testing.assert_allclose(arithmetic_mean_laplacian(stack), 2 * np.eye(3))
