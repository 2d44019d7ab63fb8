"""Host-side evaluation probes.

The reference evaluates unsupervised node embeddings by sum-pooling them to
graph level and fitting 10 LogisticRegression folds
(``train_utils.py:173-198``, ``train_pytorch_U2GNN_UnSup.py:164-188``), and
node embeddings by 2-fold logistic regression or kmeans
(``node_train_utils.py:251-277``, ``ml_node_train_utils.py:342-371``).
These probes are sklearn/CPU work by design — they run between epochs while
the device is idle.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from graph_transformer_tpu.data.splits import stratified_kfold_indices

try:
    from sklearn.linear_model import LogisticRegression

    _HAVE_SKLEARN = True
except Exception:  # pragma: no cover
    _HAVE_SKLEARN = False


def pool_node_embeddings(
    node_emb: np.ndarray,  # [N, D] dataset-wide node embeddings
    graph_offsets: np.ndarray,  # [G+1]
) -> np.ndarray:
    """Graph embeddings by sum-pooling node embeddings
    (the ``graph_pool`` spmm of ``train_pytorch_U2GNN_UnSup.py:169``)."""
    return np.add.reduceat(node_emb, graph_offsets[:-1], axis=0)


def logistic_regression_probe(
    x: np.ndarray,
    y: np.ndarray,
    train_idx: np.ndarray,
    test_idx: np.ndarray,
    solver: str = "lbfgs",
) -> float:
    """Accuracy of a logistic-regression classifier fit on the train split
    (``train_utils.py:188-191``; the reference's liblinear solver no longer
    supports multiclass in current sklearn, so lbfgs is the default)."""
    if not _HAVE_SKLEARN:  # pragma: no cover
        raise RuntimeError("sklearn unavailable for the logistic probe")
    clf = LogisticRegression(solver=solver, tol=0.001, max_iter=200)
    clf.fit(x[train_idx], y[train_idx])
    return float(clf.score(x[test_idx], y[test_idx]))


def tenfold_logistic_accuracy(
    x: np.ndarray,
    y: np.ndarray,
    n_splits: int = 10,
    seed: int = 0,
) -> Tuple[float, float]:
    """(mean, std) accuracy over stratified folds — the reference's
    unsupervised evaluation metric (``train_pytorch_U2GNN_UnSup.py:171-186``)."""
    accs = []
    for tr, te in stratified_kfold_indices(y, n_splits=n_splits, seed=seed):
        accs.append(logistic_regression_probe(x, y, tr, te))
    return float(np.mean(accs)), float(np.std(accs))
