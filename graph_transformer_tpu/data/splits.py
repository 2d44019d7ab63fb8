"""Cross-validation splits.

The reference uses ``StratifiedKFold(n_splits=10, shuffle=True,
random_state=0)`` (``U2GNN_pytorch/util.py:160-186``); its ``dataset/*/
10fold_idx/*.txt`` fixture files are unused by code.  We call sklearn when
available (bit-identical folds to the reference) and otherwise fall back to a
numpy re-implementation of the same stratified assignment.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

try:  # sklearn is an optional dependency; fall back gracefully
    from sklearn.model_selection import StratifiedKFold

    _HAVE_SKLEARN = True
except Exception:  # pragma: no cover
    _HAVE_SKLEARN = False


def stratified_kfold_indices(
    labels: np.ndarray, n_splits: int = 10, seed: int = 0
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Return [(train_idx, test_idx)] * n_splits, stratified on labels."""
    labels = np.asarray(labels)
    if _HAVE_SKLEARN:
        skf = StratifiedKFold(n_splits=n_splits, shuffle=True, random_state=seed)
        return [
            (tr.copy(), te.copy())
            for tr, te in skf.split(np.zeros(len(labels)), labels)
        ]
    # Fallback: shuffle within class, deal class members round-robin to folds.
    rng = np.random.RandomState(seed)
    fold_of = np.zeros(len(labels), dtype=np.int64)
    for c in np.unique(labels):
        idx = np.where(labels == c)[0]
        rng.shuffle(idx)
        fold_of[idx] = np.arange(len(idx)) % n_splits
    out = []
    all_idx = np.arange(len(labels))
    for f in range(n_splits):
        te = all_idx[fold_of == f]
        tr = all_idx[fold_of != f]
        out.append((tr, te))
    return out


def separate_data_idx(
    labels: np.ndarray, fold_idx: int, n_splits: int = 10, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """(train_idx, test_idx) for one fold — API shape of ``util.py:176-186``."""
    assert 0 <= fold_idx < n_splits, f"fold_idx must be in [0, {n_splits})"
    return stratified_kfold_indices(labels, n_splits, seed)[fold_idx]
