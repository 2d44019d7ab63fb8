"""Golden-file loader tests against the in-repo TU datasets.

Expected counts come from the dataset file headers and the reference loader's
printouts (``util.py:152-156``: "# classes", "# maximum node tag", "# data").
"""

import numpy as np
import pytest

from graph_transformer_tpu.data.batching import BatchBuilder, whole_dataset_batch
from graph_transformer_tpu.data.splits import separate_data_idx, stratified_kfold_indices
from graph_transformer_tpu.data.tu import load_tu_dataset, synthetic_powerlaw_dataset


def test_mutag_shapes(mutag):
    # MUTAG: 188 graphs, 2 classes, 7 node-tag values, 3371 nodes
    assert mutag.num_graphs == 188
    assert mutag.num_classes == 2
    assert mutag.feature_dim == 7
    assert mutag.num_nodes == 3371
    # one-hot features: each row sums to 1
    np.testing.assert_allclose(mutag.node_feat.sum(axis=1), 1.0)


def test_mutag_adjacency_symmetric(mutag):
    src, dst = mutag.edge_arrays()
    fwd = set(zip(src.tolist(), dst.tolist()))
    assert all((d, s) in fwd for s, d in fwd), "directed edges must be paired"
    # no self loops in the TU data
    assert not np.any(src == dst)


def test_graph_of_node(mutag):
    g = mutag.graph_of_node
    for gid in (0, 50, 187):
        lo, hi = mutag.graph_offsets[gid], mutag.graph_offsets[gid + 1]
        assert np.all(g[lo:hi] == gid)


def test_neighbors_stay_within_graph(mutag):
    src, dst = mutag.edge_arrays()
    g = mutag.graph_of_node
    assert np.all(g[src] == g[dst])


def test_ptc_shapes(ptc):
    assert ptc.num_graphs == 344
    assert ptc.num_classes == 2
    assert ptc.feature_dim == 19  # node-tag vocabulary of PTC


def test_stratified_folds(mutag):
    folds = stratified_kfold_indices(mutag.labels, 10, seed=0)
    assert len(folds) == 10
    all_test = np.concatenate([te for _, te in folds])
    assert sorted(all_test.tolist()) == list(range(mutag.num_graphs))
    tr, te = separate_data_idx(mutag.labels, 3)
    assert len(np.intersect1d(tr, te)) == 0
    # stratification: class ratio in each fold close to global
    global_ratio = mutag.labels.mean()
    for _, te in folds:
        assert abs(mutag.labels[te].mean() - global_ratio) < 0.15


def test_batch_builder_shapes(mutag, rng):
    bb = BatchBuilder(mutag, batch_size=8, num_neighbors=4, seed=0)
    b = bb.build(np.arange(8))
    assert b.x.shape[0] == b.neigh.shape[0] == bb.n_pad
    assert b.neigh.shape[1] == 5
    assert b.labels.shape == (8,)
    n_real = int(b.node_mask.sum())
    assert n_real == int(mutag.graph_num_nodes[:8].sum())
    # self at slot 0
    np.testing.assert_array_equal(
        np.asarray(b.neigh)[:n_real, 0], np.arange(n_real)
    )
    # graph ids: padding gets B
    assert np.all(np.asarray(b.graph_id)[n_real:] == 8)
    # neighbors are batch-local and within bounds
    assert np.asarray(b.neigh).max() < bb.n_pad
    # edges: masked edges match real edge count
    e_real = int(np.asarray(b.edge_mask).sum())
    src, dst = mutag.edge_arrays()
    g = mutag.graph_of_node
    assert e_real == int(np.sum(g[src] < 8))


def test_batch_neighbor_sampling_semantics(mutag, rng):
    """Sampled neighbors must be true graph neighbors (or self for isolated)."""
    bb = BatchBuilder(mutag, batch_size=4, num_neighbors=8, seed=1)
    b = bb.build([0, 1, 2, 3])
    n_real = int(b.node_mask.sum())
    neigh = np.asarray(b.neigh)[:n_real]
    gidx = np.asarray(b.node_gidx)[:n_real]
    for v in range(0, n_real, 7):
        s, e = mutag.nbr_offsets[gidx[v]], mutag.nbr_offsets[gidx[v] + 1]
        allowed = set(mutag.nbr_ids[s:e].tolist()) | {gidx[v]}
        got_global = gidx[neigh[v]]
        assert set(got_global.tolist()) <= allowed


def test_whole_dataset_batch(mutag):
    b = whole_dataset_batch(mutag, num_neighbors=4)
    assert int(b.node_mask.sum()) == mutag.num_nodes
    np.testing.assert_array_equal(
        np.asarray(b.node_gidx)[: mutag.num_nodes], np.arange(mutag.num_nodes)
    )


def test_eval_batches_cover_all(mutag):
    bb = BatchBuilder(mutag, batch_size=16, num_neighbors=4, seed=0)
    idx = np.arange(50)
    seen = 0
    for batch, n_real in bb.eval_batches(idx):
        seen += n_real
    assert seen == 50


def test_synthetic_powerlaw():
    ds = synthetic_powerlaw_dataset(num_graphs=16, mean_nodes=50, seed=0)
    assert ds.num_graphs == 16
    deg = ds.degrees
    assert deg.max() > 2 * np.median(deg)  # heavy tail
    src, dst = ds.edge_arrays()
    g = ds.graph_of_node
    assert np.all(g[src] == g[dst])


def test_node_attributes_sidecar(tmp_path):
    """use_node_attributes loads a <DS>_node_attributes.txt sidecar and uses
    it AS the node features (the reference's dead attribute branch done
    right, util.py:97-98,116-130); absent sidecar warns and falls back."""
    import shutil
    import warnings

    import numpy as np

    from graph_transformer_tpu.data.tu import load_tu_dataset

    src = "/root/reference/dataset/MUTAG/MUTAG.txt"
    d = tmp_path / "MUTAG"
    d.mkdir()
    shutil.copy(src, d / "MUTAG.txt")

    base = load_tu_dataset("MUTAG", data_dir=str(tmp_path))
    rng = np.random.default_rng(0)
    attrs = rng.standard_normal((base.num_nodes, 3)).astype(np.float32)
    with open(d / "MUTAG_node_attributes.txt", "w") as f:
        for row in attrs:
            f.write(", ".join(f"{v:.6f}" for v in row) + "\n")

    ds = load_tu_dataset("MUTAG", data_dir=str(tmp_path),
                         use_node_attributes=True)
    assert ds.feature_dim == 3
    np.testing.assert_allclose(ds.node_feat, attrs, atol=1e-5)
    # graph structure unchanged
    np.testing.assert_array_equal(ds.nbr_offsets, base.nbr_offsets)

    # absent sidecar: warn + one-hot fallback
    (d / "MUTAG_node_attributes.txt").unlink()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ds2 = load_tu_dataset("MUTAG", data_dir=str(tmp_path),
                              use_node_attributes=True)
    assert any("sidecar" in str(x.message) for x in w)
    assert ds2.feature_dim == base.feature_dim


def test_graph_of_node_with_empty_graph():
    """graph_of_node must stay correct when a graph owns zero nodes (the
    old offsets+cumsum trick collapsed duplicate offsets — VERDICT r3
    weak-item 5)."""
    from graph_transformer_tpu.data.tu import GraphDataset

    # 3 graphs: 2 nodes, 0 nodes, 1 node
    ds = GraphDataset(
        name="toy",
        node_feat=np.eye(3, dtype=np.float32),
        nbr_offsets=np.array([0, 1, 2, 2], dtype=np.int64),
        nbr_ids=np.array([1, 0], dtype=np.int32),
        graph_offsets=np.array([0, 2, 2, 3], dtype=np.int64),
        labels=np.array([0, 1, 0], dtype=np.int32),
        num_classes=2,
    )
    np.testing.assert_array_equal(ds.graph_of_node, [0, 0, 2])


def test_graph_of_node_matches_offsets(mutag):
    g = mutag.graph_of_node
    off = mutag.graph_offsets
    for gid in (0, 1, mutag.num_graphs - 1):
        assert (g[off[gid]:off[gid + 1]] == gid).all()


def test_permute_graphs_invariants(mutag):
    """permute_graphs reorders graphs (killing the file-order label leak,
    see scripts/unsup_leak_control.py) while preserving every per-graph
    structure: sizes, labels, degree and tag multisets, edge symmetry."""
    from graph_transformer_tpu.data.tu import permute_graphs

    p = permute_graphs(mutag, seed=1)
    g = np.random.default_rng(1).permutation(mutag.num_graphs)
    assert p.num_nodes == mutag.num_nodes
    assert p.num_directed_edges == mutag.num_directed_edges
    np.testing.assert_array_equal(p.labels, mutag.labels[g])
    for new_gid in (0, 5, mutag.num_graphs - 1):
        old_gid = g[new_gid]
        a, b = p.graph_offsets[new_gid], p.graph_offsets[new_gid + 1]
        oa, ob = mutag.graph_offsets[old_gid], mutag.graph_offsets[old_gid + 1]
        np.testing.assert_array_equal(
            np.sort(p.degrees[a:b]), np.sort(mutag.degrees[oa:ob])
        )
        np.testing.assert_array_equal(
            np.sort(p.node_feat[a:b].argmax(1)),
            np.sort(mutag.node_feat[oa:ob].argmax(1)),
        )
    # edges stay within their graph and remain paired
    src, dst = p.edge_arrays()
    gof = p.graph_of_node
    assert (gof[src] == gof[dst]).all()


def test_tu_files_are_class_sorted(mutag):
    """The round-4 leak finding's premise: TU files list graphs sorted by
    class, so the graph index alone predicts the label (this is WHY
    permute_graphs exists — any transductive global-id protocol can read
    the label from node-id statistics)."""
    y = mutag.labels
    # one class occupies a contiguous prefix
    changes = int((np.diff(y) != 0).sum())
    assert changes == 1, "MUTAG labels are a two-block sequence"
