"""Clustering / embedding evaluation metrics.

Capability parity with ``U2GNN_pytorch/metrics.py``: purity (`:13-45`),
permutation-max clustering accuracy (`:48-68`), majority-vote cluster
labeling + average clustering error (`:70-82`), spectral evaluation from a
Laplacian (eigh → first K eigvecs → KMeans → all metrics, `:84-96`) and the
same from embeddings (`:99-111`).  NMI/ARI delegate to sklearn when present.
"""

from __future__ import annotations

import itertools
from typing import Dict

import numpy as np

try:
    from sklearn import metrics as _skm
    from sklearn.cluster import KMeans

    _HAVE_SKLEARN = True
except Exception:  # pragma: no cover
    _HAVE_SKLEARN = False


def purity(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Σ_clusters max-class count / N (``metrics.py:13-45``)."""
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    total = 0
    for c in np.unique(y_pred):
        members = y_true[y_pred == c]
        if len(members):
            total += np.bincount(members).max()
    return total / len(y_true)


def clustering_accuracy(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Best label-permutation accuracy (``metrics.py:48-68``).

    Uses the Hungarian assignment when sklearn/scipy are present (optimal and
    O(k³) instead of the reference's O(k!) permutation scan — identical
    result), else falls back to the permutation scan for small k.
    """
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    classes = np.unique(y_true)
    clusters = np.unique(y_pred)
    w = np.zeros((len(clusters), len(classes)), dtype=np.int64)
    for i, c in enumerate(clusters):
        for j, t in enumerate(classes):
            w[i, j] = np.sum((y_pred == c) & (y_true == t))
    try:
        from scipy.optimize import linear_sum_assignment

        ri, ci = linear_sum_assignment(-w)
        return w[ri, ci].sum() / len(y_true)
    except Exception:  # pragma: no cover
        best = 0
        for perm in itertools.permutations(range(len(classes))):
            score = sum(
                w[i, perm[i]] for i in range(min(len(clusters), len(classes)))
            )
            best = max(best, score)
        return best / len(y_true)


def clustering_error_majority(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Average per-cluster error under majority-vote labeling
    (``metrics.py:70-82``)."""
    y_true, y_pred = np.asarray(y_true), np.asarray(y_pred)
    errs = []
    for c in np.unique(y_pred):
        members = y_true[y_pred == c]
        if len(members):
            errs.append(1.0 - np.bincount(members).max() / len(members))
    return float(np.mean(errs)) if errs else 1.0


def nmi(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    if _HAVE_SKLEARN:
        return float(_skm.normalized_mutual_info_score(y_true, y_pred))
    raise RuntimeError("sklearn unavailable for NMI")


def ari(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    if _HAVE_SKLEARN:
        return float(_skm.adjusted_rand_score(y_true, y_pred))
    raise RuntimeError("sklearn unavailable for ARI")


def _kmeans(x: np.ndarray, k: int, seed: int = 0) -> np.ndarray:
    if _HAVE_SKLEARN:
        return KMeans(n_clusters=k, n_init=10, random_state=seed).fit_predict(x)
    # tiny numpy fallback (Lloyd's)
    rng = np.random.RandomState(seed)
    centers = x[rng.choice(len(x), k, replace=False)]
    for _ in range(100):
        d = ((x[:, None] - centers[None]) ** 2).sum(-1)
        a = d.argmin(1)
        new = np.stack(
            [x[a == j].mean(0) if np.any(a == j) else centers[j] for j in range(k)]
        )
        if np.allclose(new, centers):
            break
        centers = new
    return a


def all_metrics(y_true: np.ndarray, y_pred: np.ndarray) -> Dict[str, float]:
    out = {
        "purity": purity(y_true, y_pred),
        "accuracy": clustering_accuracy(y_true, y_pred),
        "avg_error": clustering_error_majority(y_true, y_pred),
    }
    if _HAVE_SKLEARN:
        out["nmi"] = nmi(y_true, y_pred)
        out["ari"] = ari(y_true, y_pred)
    return out


def spectral_eval_from_laplacian(
    lap: np.ndarray, y_true: np.ndarray, num_clusters: int, seed: int = 0
) -> Dict[str, float]:
    """eigh → K smallest eigenvectors → KMeans → metrics
    (``metrics.py:84-96``)."""
    vals, vecs = np.linalg.eigh(lap)
    emb = vecs[:, :num_clusters]
    pred = _kmeans(emb, num_clusters, seed)
    return all_metrics(y_true, pred)


def eval_from_embeddings(
    emb: np.ndarray, y_true: np.ndarray, num_clusters: int, seed: int = 0
) -> Dict[str, float]:
    """KMeans on embeddings → metrics (``metrics.py:99-111``)."""
    pred = _kmeans(np.asarray(emb), num_clusters, seed)
    return all_metrics(y_true, pred)
