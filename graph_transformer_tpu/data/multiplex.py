"""Multiplex (multilayer) graph datasets.

Capability parity with ``U2GNN_pytorch/data_utils.py`` — every loader returns
one :class:`MultiplexDataset` (dense per-view adjacency/Laplacian stacks,
per-view features, node labels, train/test masks) instead of the reference's
8-tuple of mixed torch/numpy objects:

- synthetic 4-layer gaussian clusters (``data_utils.py:203-279,854-893``)
- Vickers–Chan 7th-graders multiplex edges   (``:333-381``)
- Congress votes — per-vote coincidence layers (``:395-444``)
- Mammographic masses — per-attribute layers  (``:446-499``)
- Balance-scale — per-attribute layers        (``:501-560``)
- Leskovec–Ng edge list + .mat adjacency      (``:563-653``)
- UCI mfeat 6-view kNN-similarity graphs      (``:792-851``)
- generic multi-view .mat (h5py and scipy)    (``:655-663,694-790``)
- kNN similarity extra layer                  (``:719-727``)
- PCA / scale / random-pad feature shaping    (``:764-776``)
- unnormalized Laplacian ``sgwt_raw_laplacian`` (``:158-176``)
- random train/test mask generation            (``:322-331``)

File-based loaders take explicit paths and raise a clear error when the file
is absent (the multiplex source datasets are not shipped with the reference
checkout either — only ``code_m/data/NGs.mat`` is).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

try:
    from sklearn.decomposition import PCA
    from sklearn.neighbors import kneighbors_graph
    from sklearn.preprocessing import scale as _sk_scale

    _HAVE_SKLEARN = True
except Exception:  # pragma: no cover
    _HAVE_SKLEARN = False


@dataclasses.dataclass
class MultiplexDataset:
    """One node set observed through S graph views."""

    name: str
    x: np.ndarray  # [N, D, S] float32 per-view node features
    adj: np.ndarray  # [N, N, S] float32 per-view adjacency
    lap: np.ndarray  # [N, N, S] float64 per-view unnormalized Laplacian
    labels: np.ndarray  # [N] int32
    train_mask: np.ndarray  # [N] bool
    test_mask: np.ndarray  # [N] bool

    @property
    def num_nodes(self) -> int:
        return self.x.shape[0]

    @property
    def num_views(self) -> int:
        return self.adj.shape[2]

    @property
    def num_classes(self) -> int:
        return len(np.unique(self.labels))

    @property
    def feature_dim(self) -> int:
        return self.x.shape[1]


# ------------------------------------------------------------------- helpers
def raw_laplacian(w: np.ndarray) -> np.ndarray:
    """Unnormalized Laplacian L = D - W_offdiag of a (possibly directed)
    weight matrix, row degrees taken on Wᵀ — the exact semantics of
    ``sgwt_raw_laplacian`` (``data_utils.py:158-176``)."""
    b = np.asarray(w, dtype=np.float64).T
    degrees = b.sum(axis=1)
    off = b.copy()
    np.fill_diagonal(off, 0.0)
    return np.diag(degrees - np.diag(b)) - off


def knn_graph(
    x: np.ndarray,
    n_neighbors: int,
    metric: str = "minkowski",
    include_self: bool = False,
    symmetrize: str = "avg_binary",
) -> np.ndarray:
    """kNN adjacency.  ``symmetrize='avg_binary'`` reproduces
    ``build_kneighbors`` (``data_utils.py:177-185``): (A+Aᵀ)/2 > 0;
    ``'none'`` keeps the directed graph (the similarity-layer path,
    ``:719-727``)."""
    if not _HAVE_SKLEARN:  # pragma: no cover
        raise RuntimeError("sklearn required for kNN graph construction")
    a = kneighbors_graph(
        x, n_neighbors, metric=metric, include_self=include_self
    ).toarray()
    if symmetrize == "avg_binary":
        return ((a + a.T) / 2 > 0).astype(np.float64)
    return a


def make_symmetric(a: np.ndarray) -> np.ndarray:
    """((A+Aᵀ)/2 > 0) as int (``data_utils.py:690-693``)."""
    return (((a + a.T) / 2) > 0).astype(int)


def train_test_masks(n: int, fraction: float = 0.6, rng=None):
    """Random disjoint train/test masks (``data_utils.py:322-331``)."""
    rng = rng or np.random.default_rng(0)
    order = rng.permutation(n)
    k = int(fraction * n)
    train = np.zeros(n, bool)
    test = np.zeros(n, bool)
    train[order[:k]] = True
    test[order[k:]] = True
    return train, test


def shape_features(
    feats: np.ndarray, size_x: int, do_scale: bool = True, rng=None
) -> np.ndarray:
    """Reference feature shaping (``data_utils.py:764-776``): standardize,
    then PCA down to ``size_x`` if wider, random-normal pad if narrower."""
    rng = rng or np.random.default_rng(0)
    f = _sk_scale(feats) if (do_scale and _HAVE_SKLEARN) else np.asarray(feats, float)
    n, d = f.shape
    if size_x < d:
        if not _HAVE_SKLEARN:  # pragma: no cover
            raise RuntimeError("sklearn required for PCA reduction")
        return PCA(n_components=size_x).fit_transform(f)
    if size_x > d:
        return np.concatenate([f, rng.normal(size=(n, size_x - d))], axis=1)
    return f


def coincidence_digraph(values: Sequence) -> np.ndarray:
    """Directed attribute-coincidence graph: edge i→j iff value_i == value_j
    (including i==j per networkx self-loop semantics minus the adjacency
    diagonal — the reference's ``add_edges_for_index`` adds (i, i) too, and
    ``nx.adjacency_matrix`` keeps it; we reproduce the resulting matrix,
    ``data_utils.py:385-393``)."""
    v = np.asarray(values)
    a = (v[:, None] == v[None, :]).astype(int)
    return a


def _edge_list_adj(src, dst, n) -> np.ndarray:
    a = np.zeros((n, n), dtype=int)
    a[np.asarray(src), np.asarray(dst)] = 1
    return a


def _stack_views(adj_list: List[np.ndarray]):
    adj = np.stack(adj_list, axis=2).astype(np.float32)
    lap = np.stack([raw_laplacian(a) for a in adj_list], axis=2)
    return adj, lap


def _random_features(n: int, size_x: int, n_views: int, rng) -> np.ndarray:
    x = rng.normal(size=(n, size_x)).astype(np.float32)
    return np.stack([x] * n_views, axis=2)


# ------------------------------------------------------------------- loaders
def gaussian_multiplex(
    n: int = 200,
    num_clusters: int = 5,
    size_x: int = 8,
    seed: int = 100,
    knn: int = 10,
) -> MultiplexDataset:
    """Synthetic 4-view gaussian-cluster multiplex
    (``data_utils.py:203-279``): per view, clusters drawn from random
    gaussians; kNN(10) graph on the per-view signals; features = per-view 2-d
    signals (max-normalized) concatenated with a shared random block."""
    rng = np.random.default_rng(seed)
    per = n // num_clusters
    n = per * num_clusters
    views = 4
    sig_list, adj_list = [], []
    for _ in range(views):
        sigs = []
        for _c in range(num_clusters):
            mean = 3 * rng.standard_normal(2)
            cov = np.zeros((2, 2))
            for _ in range(5):
                m = (3 / 5) * rng.standard_normal((2, 2))
                cov += m.T @ m
            sigs.append(rng.multivariate_normal(mean, cov, per))
        sig = np.concatenate(sigs, axis=0)
        sig_list.append(sig)
        adj_list.append(knn_graph(sig, knn))
    signals = np.stack(sig_list, axis=2)  # [N, 2, S]
    signals = signals / signals.max()
    pad = _random_features(n, size_x, views, rng)
    x = np.concatenate([signals, pad], axis=1).astype(np.float32)
    adj, lap = _stack_views(adj_list)
    labels = np.repeat(np.arange(num_clusters), per).astype(np.int32)
    train, test = train_test_masks(n, rng=rng)
    return MultiplexDataset("gaussian", x, adj, lap, labels, train, test)


def vickers_chan(
    edges_path: str, size_x: int = 8, train_fraction: float = 0.6, seed: int = 0
) -> MultiplexDataset:
    """Vickers–Chan 7th-graders: 3 directed layers from a
    "layerId src dst weight" edge list, 1-indexed; labels: nodes 0-11 boys,
    12+ girls (``data_utils.py:333-381``)."""
    import pandas as pd

    df = pd.read_csv(
        edges_path, sep=" ", header=None,
        names=["layerId", "src", "dst", "weight"], dtype=int,
    )
    df["src"] -= 1
    df["dst"] -= 1
    n = int(df["src"].max()) + 1
    adj_list = [
        _edge_list_adj(d["src"], d["dst"], n)
        for _, d in ((l, df[df.layerId == l]) for l in (1, 2, 3))
    ]
    rng = np.random.default_rng(seed)
    adj, lap = _stack_views(adj_list)
    labels = np.zeros(n, np.int32)
    labels[12:] = 1
    train, test = train_test_masks(n, train_fraction, rng)
    x = _random_features(n, size_x, 3, rng)
    return MultiplexDataset("vickers_chan", x, adj, lap, labels, train, test)


def _attribute_layers_dataset(
    name: str,
    table: np.ndarray,  # [N, L] attribute values (object/str ok)
    labels: np.ndarray,
    attach_features: bool,
    size_x: int,
    train_fraction: float,
    seed: int,
) -> MultiplexDataset:
    """Shared core of the congress/mammographic/balance loaders: one graph
    view per attribute column, edges = value coincidence."""
    rng = np.random.default_rng(seed)
    n, n_views = table.shape
    adj_list = [coincidence_digraph(table[:, j]) for j in range(n_views)]
    adj, lap = _stack_views(adj_list)
    rand = _random_features(n, size_x, n_views, rng)
    if attach_features:
        numeric = np.where(table == "?", -1, table).astype(float)
        scaled = _sk_scale(numeric) if _HAVE_SKLEARN else numeric
        feat = np.stack([scaled] * n_views, axis=2).astype(np.float32)
        x = np.concatenate([feat, rand], axis=1)
    else:
        x = rand
    train, test = train_test_masks(n, train_fraction, rng)
    return MultiplexDataset(
        name, x, adj, lap, labels.astype(np.int32), train, test
    )


def congress_votes(
    data_path: str, size_x: int = 8, train_fraction: float = 0.6, seed: int = 0
) -> MultiplexDataset:
    """UCI house-votes-84: 16 vote-coincidence layers; label = party
    (``data_utils.py:395-444``; random features only)."""
    import pandas as pd

    df = pd.read_csv(data_path, sep=",", header=None)
    labels = (df[0] == "republican").to_numpy().astype(np.int32)
    table = df.iloc[:, 1:].to_numpy()
    return _attribute_layers_dataset(
        "congress", table, labels, False, size_x, train_fraction, seed
    )


def mammographic(
    data_path: str, size_x: int = 8, train_fraction: float = 0.6, seed: int = 0
) -> MultiplexDataset:
    """UCI mammographic masses: 5 attribute layers; features = scaled
    attributes + random pad (``data_utils.py:446-499``)."""
    import pandas as pd

    df = pd.read_csv(data_path, sep=",", header=None)
    labels = df.iloc[:, -1].to_numpy().astype(np.int32)
    table = df.iloc[:, :-1].to_numpy()
    return _attribute_layers_dataset(
        "mammographic", table, labels, True, size_x, train_fraction, seed
    )


def balance_scale(
    data_path: str, size_x: int = 8, train_fraction: float = 0.6, seed: int = 0
) -> MultiplexDataset:
    """UCI balance-scale: label in column 0, 4 attribute layers
    (``data_utils.py:501-560``)."""
    import pandas as pd

    df = pd.read_csv(data_path, sep=",", header=None)
    labels = pd.Categorical(df[0]).codes.astype(np.int32)
    table = df.iloc[:, 1:].to_numpy()
    return _attribute_layers_dataset(
        "balance_scale", table, labels, True, size_x, train_fraction, seed
    )


def leskovec_ng(
    edges_path: str,
    labels_path: str,
    size_x: int = 8,
    train_fraction: float = 0.6,
    seed: int = 0,
) -> MultiplexDataset:
    """Leskovec–Ng co-authorship, edge-list form: 4 layers of
    "layerId src dst", 0-indexed (``data_utils.py:563-608``)."""
    import pandas as pd

    df = pd.read_csv(
        edges_path, sep=" ", header=None, names=["layerId", "src", "dst"],
        dtype=int,
    )
    labels = np.loadtxt(labels_path).astype(np.int32)
    n = int(max(df["src"].max(), df["dst"].max())) + 1
    adj_list = [
        _edge_list_adj(d["src"], d["dst"], n)
        for _, d in ((l, df[df.layerId == l]) for l in (0, 1, 2, 3))
    ]
    rng = np.random.default_rng(seed)
    adj, lap = _stack_views(adj_list)
    train, test = train_test_masks(n, train_fraction, rng)
    x = _random_features(n, size_x, len(adj_list), rng)
    return MultiplexDataset("leskovec_ng", x, adj, lap, labels, train, test)


def leskovec_ng_mat(
    data_folder: str, size_x: int = 8, train_fraction: float = 0.6, seed: int = 0
) -> MultiplexDataset:
    """Leskovec–Ng from per-era .mat adjacency files A1..A4 + LN_true.mat
    labels (``data_utils.py:614-653``)."""
    import scipy.io

    files = ["LN_1995_1999.mat", "LN_2000_2004.mat", "LN_2005_2009.mat",
             "LN_2010_2014.mat"]
    adj_list = []
    for i, f in enumerate(files):
        m = scipy.io.loadmat(os.path.join(data_folder, f))
        a = np.asarray(m[f"A{i+1}"])
        adj_list.append((a > 0).astype(int))
    labels = (
        np.asarray(
            scipy.io.loadmat(os.path.join(data_folder, "LN_true.mat"))["s_LNG"]
        ).flatten().astype(np.int32)
        - 1
    )
    rng = np.random.default_rng(seed)
    adj, lap = _stack_views(adj_list)
    n = adj.shape[0]
    train, test = train_test_masks(n, train_fraction, rng)
    x = _random_features(n, size_x, len(files), rng)
    return MultiplexDataset("leskovec_ng_mat", x, adj, lap, labels, train, test)


def multiview_features_dataset(
    name: str,
    view_feats: List[np.ndarray],  # per-view [N, D_v] feature matrices
    labels: np.ndarray,
    size_x: int = 8,
    num_similarity_neighbors: int = 10,
    scale_features: bool = True,
    train_fraction: float = 0.6,
    seed: int = 0,
) -> MultiplexDataset:
    """Core of the multi-view loaders (scipy .mat ``data_utils.py:737-790``,
    UCI mfeat ``:792-851``): per view, a cosine-kNN graph on the raw
    features; per-view features shaped to ``size_x`` (PCA/pad)."""
    rng = np.random.default_rng(seed)
    n = view_feats[0].shape[0]
    adj_list, feat_list = [], []
    for feats in view_feats:
        adj_list.append(
            knn_graph(
                feats, num_similarity_neighbors, metric="cosine",
                include_self=True, symmetrize="none",
            )
        )
        feat_list.append(
            shape_features(feats, size_x, scale_features, rng).astype(np.float32)
        )
    # Laplacians use the symmetrized graphs (``data_utils.py:781``)
    adj = np.stack(adj_list, axis=2).astype(np.float32)
    lap = np.stack(
        [raw_laplacian(make_symmetric(a)) for a in adj_list], axis=2
    )
    x = np.stack(feat_list, axis=2)
    train, test = train_test_masks(n, train_fraction, rng)
    return MultiplexDataset(
        name, x, adj, lap, labels.astype(np.int32), train, test
    )


def uci_mfeat(
    data_folder: str, size_x: int = 8, num_similarity_neighbors: int = 10,
    train_fraction: float = 0.6, seed: int = 0,
) -> MultiplexDataset:
    """UCI multiple-features digits: 6 views (fac/fou/kar/mor/pix/zer),
    2000 samples, labels 10×200 block order (``data_utils.py:792-851``)."""
    files = ["mfeat-fac", "mfeat-fou", "mfeat-kar", "mfeat-mor",
             "mfeat-pix", "mfeat-zer"]
    views = []
    for f in files:
        with open(os.path.join(data_folder, f)) as fh:
            views.append(
                np.array([l.split() for l in fh.readlines()], dtype=float)
            )
    labels = np.repeat(np.arange(10), 200)
    return multiview_features_dataset(
        "uci_mfeat", views, labels, size_x, num_similarity_neighbors,
        True, train_fraction, seed,
    )


def mat_multiview(
    mat_path: str, size_x: int = 8, num_similarity_neighbors: int = 10,
    scale_features: bool = True, train_fraction: float = 0.6, seed: int = 0,
) -> MultiplexDataset:
    """Generic multi-view .mat with ``data`` cell array of per-view [D, N]
    features + ``truelabel`` (scipy-format, ``data_utils.py:737-790``; covers
    code_m/data/NGs.mat)."""
    import scipy.io
    import scipy.sparse

    m = scipy.io.loadmat(mat_path)
    num_views = m["data"].shape[1]
    labels = np.asarray(m["truelabel"][0, 0]).squeeze().astype(np.int32)
    labels = labels - labels.min()
    views = []
    for i in range(num_views):
        feats = m["data"][0, i].T
        if scipy.sparse.issparse(feats):
            feats = np.asarray(feats.todense())
        views.append(np.asarray(feats, dtype=float))
    name = os.path.splitext(os.path.basename(mat_path))[0]
    return multiview_features_dataset(
        name, views, labels, size_x, num_similarity_neighbors,
        scale_features, train_fraction, seed,
    )


def single_graph_with_similarity_layer(
    adj: np.ndarray,  # [N, N] base graph
    feats: np.ndarray,  # [N, D] raw features
    labels: np.ndarray,
    size_x: int = 8,
    create_similarity_layer: bool = True,
    num_similarity_neighbors: int = 10,
    scale_features: bool = True,
    train_fraction: float = 0.6,
    seed: int = 0,
    name: str = "graph+sim",
) -> MultiplexDataset:
    """A single graph optionally augmented with a cosine-kNN feature-
    similarity view (``data_utils.py:694-735`` ``create_similarity_layer``) —
    also the adapter that lifts any node-classification graph (citation
    datasets etc.) into the multiplex pipeline."""
    rng = np.random.default_rng(seed)
    n = adj.shape[0]
    shaped = shape_features(feats, size_x, scale_features, rng).astype(np.float32)
    adj_list = [np.asarray(adj, float)]
    lap_list = [raw_laplacian(make_symmetric(adj_list[0]))]
    feat_list = [shaped]
    if create_similarity_layer:
        sim = knn_graph(
            feats, num_similarity_neighbors, metric="cosine",
            include_self=False, symmetrize="none",
        )
        adj_list.append(sim)
        lap_list.append(raw_laplacian(make_symmetric(sim)))
        feat_list.append(shaped)
    train, test = train_test_masks(n, train_fraction, rng)
    return MultiplexDataset(
        name,
        np.stack(feat_list, axis=2),
        np.stack(adj_list, axis=2).astype(np.float32),
        np.stack(lap_list, axis=2),
        np.asarray(labels, np.int32),
        train,
        test,
    )


# ------------------------------------------------------------------ registry
MULTIPLEX_LOADERS: Dict[str, Callable[..., MultiplexDataset]] = {
    "gaussian": gaussian_multiplex,
    "vickers_chan": vickers_chan,
    "congress": congress_votes,
    "mammographic": mammographic,
    "balance_scale": balance_scale,
    "leskovec_ng": leskovec_ng,
    "leskovec_ng_mat": leskovec_ng_mat,
    "uci_mfeat": uci_mfeat,
    "mat_multiview": mat_multiview,
}


def load_multiplex(name: str, **kwargs) -> MultiplexDataset:
    """One dispatch replacing the reference's 11-way if/elif
    (``ml_node_train_utils.py:47-177``)."""
    if name not in MULTIPLEX_LOADERS:
        raise KeyError(
            f"unknown multiplex dataset {name!r}; have {sorted(MULTIPLEX_LOADERS)}"
        )
    return MULTIPLEX_LOADERS[name](**kwargs)
