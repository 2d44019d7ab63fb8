"""Laplacians and their means over multiplex graph layers.

Capability parity with the reference's spectral-clustering baselines:
unnormalized Laplacian (``data_utils.py:158-176`` ``sgwt_raw_laplacian``),
arithmetic mean over layers, and the **Riemannian (Karcher) geometric mean of
regularized Laplacians** the fork computes through pyriemann
(``util.py:43-52`` ``get_gm``: ``mean_riemann([L_i + εI])``;
``code_m/Multilayer_GeometricMean.ipynb``).  pyriemann is not a dependency
here — the Karcher mean is the standard fixed-point iteration on the SPD
manifold, implemented directly.
"""

from __future__ import annotations

import numpy as np


def unnormalized_laplacian(adj: np.ndarray) -> np.ndarray:
    """L = D - A (``data_utils.py:158-176``)."""
    adj = np.asarray(adj, dtype=np.float64)
    return np.diag(adj.sum(axis=1)) - adj


def arithmetic_mean_laplacian(laps: np.ndarray) -> np.ndarray:
    """Mean over the layer axis; accepts [N, N, S] or a list."""
    laps = np.asarray(laps, dtype=np.float64)
    if laps.ndim == 3:
        return laps.mean(axis=2)
    return np.mean(laps, axis=0)


def _sqrtm_spd(a: np.ndarray):
    vals, vecs = np.linalg.eigh(a)
    vals = np.maximum(vals, 1e-18)
    s = np.sqrt(vals)
    return (vecs * s) @ vecs.T, (vecs / s) @ vecs.T


def _logm_spd(a: np.ndarray) -> np.ndarray:
    vals, vecs = np.linalg.eigh(a)
    vals = np.maximum(vals, 1e-18)
    return (vecs * np.log(vals)) @ vecs.T


def _expm_sym(a: np.ndarray) -> np.ndarray:
    vals, vecs = np.linalg.eigh((a + a.T) / 2)
    return (vecs * np.exp(vals)) @ vecs.T


def geometric_mean_laplacian(
    laps: np.ndarray,
    reg: float = 10.0,
    tol: float = 1e-8,
    max_iter: int = 100,
) -> np.ndarray:
    """Karcher (affine-invariant Riemannian) mean of ``L_i + reg·I``.

    Fixed-point iteration M ← M½ exp(mean_i log(M^-½ (L_i+εI) M^-½)) M½,
    matching pyriemann's ``mean_riemann`` as used by the fork's ``get_gm``
    (``util.py:43-52``: regularization 10·I, and the regularized mean is
    returned as-is, not de-regularized).
    """
    laps = np.asarray(laps, dtype=np.float64)
    if laps.ndim == 3:
        mats = [laps[:, :, i] for i in range(laps.shape[2])]
    else:
        mats = [np.asarray(m, dtype=np.float64) for m in laps]
    n = mats[0].shape[0]
    eye = np.eye(n)
    mats = [m + reg * eye for m in mats]

    m = np.mean(mats, axis=0)  # init at the arithmetic mean
    for _ in range(max_iter):
        s, s_inv = _sqrtm_spd(m)
        tangent = np.mean([_logm_spd(s_inv @ a @ s_inv) for a in mats], axis=0)
        norm = np.linalg.norm(tangent)
        m = s @ _expm_sym(tangent) @ s
        m = (m + m.T) / 2
        if norm < tol:
            break
    return m
