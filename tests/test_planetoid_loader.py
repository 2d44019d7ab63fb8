"""Planetoid (``ind.<name>.*``) loader tests against generated fixtures.

The raw cora/citeseer/pubmed downloads are not available in this image, so
these tests generate byte-accurate Planetoid-format files — pickled scipy
sparse feature blocks, one-hot label arrays, the neighbor-dict graph pickle,
and the test-index file, including the citeseer quirk of *isolated test
nodes missing from tx* — then drive ``load_planetoid`` and the node trainer
end-to-end over them.  Format reference: the files DGL's CitationGraphDataset
consumes (the reference loads through DGL, ``node_train_utils.py:41-68``).
"""

from __future__ import annotations

import os
import pickle

import numpy as np
import pytest
import scipy.sparse as sp

from graph_transformer_tpu.data.citation import load_planetoid

N_TRAIN, N_VAL, N_ALLX, N_TEST, D, C = 4, 3, 12, 4, 8, 3
# test ids leave node 14 isolated-from-tx (the citeseer gap quirk);
# tx/ty rows are stored in test.index FILE order (shuffled, as in the real
# downloads), not sorted order
TEST_IDS_FILE_ORDER = [13, 15, 12]
TEST_IDS = sorted(TEST_IDS_FILE_ORDER)


def _write_fixture(d: str, name: str = "cora") -> dict:
    rng = np.random.default_rng(0)
    n = N_ALLX + N_TEST  # 16 nodes total
    feats = (rng.random((n, D)) < 0.3).astype(np.float32)
    labels = rng.integers(0, C, size=n).astype(np.int64)
    onehot = np.eye(C, dtype=np.float32)[labels]

    # ring + chords graph over all ids (graph dict covers every node)
    graph = {i: [(i + 1) % n, (i - 1) % n] for i in range(n)}
    graph[0].append(7)
    graph[7].append(0)

    def dump(suffix, obj):
        with open(os.path.join(d, f"ind.{name}.{suffix}"), "wb") as f:
            pickle.dump(obj, f)

    dump("x", sp.csr_matrix(feats[:N_TRAIN]))
    dump("y", onehot[:N_TRAIN])
    dump("allx", sp.csr_matrix(feats[:N_ALLX]))
    dump("ally", onehot[:N_ALLX])
    dump("tx", sp.csr_matrix(feats[TEST_IDS_FILE_ORDER]))
    dump("ty", onehot[TEST_IDS_FILE_ORDER])
    dump("graph", graph)
    with open(os.path.join(d, f"ind.{name}.test.index"), "w") as f:
        for i in TEST_IDS_FILE_ORDER:
            f.write(f"{i}\n")
    return {"feats": feats, "labels": labels, "graph": graph, "n": n}


@pytest.fixture()
def fixture_dir(tmp_path):
    truth = _write_fixture(str(tmp_path))
    return str(tmp_path), truth


def test_planetoid_parse_shapes_and_features(fixture_dir):
    d, truth = fixture_dir
    ds = load_planetoid("cora", data_dir=d)
    assert ds.num_nodes == truth["n"]
    assert ds.feature_dim == D
    assert ds.num_classes == C
    # feature stitching: allx rows verbatim; tx rows land at their test ids
    np.testing.assert_allclose(
        ds.graph.node_feat[:N_ALLX], truth["feats"][:N_ALLX]
    )
    for i in TEST_IDS:
        np.testing.assert_allclose(ds.graph.node_feat[i], truth["feats"][i])
    # the isolated test node (14) got the zero fill-in row
    assert 14 not in TEST_IDS
    np.testing.assert_allclose(ds.graph.node_feat[14], 0.0)


def test_planetoid_labels_and_masks(fixture_dir):
    d, truth = fixture_dir
    ds = load_planetoid("cora", data_dir=d)
    np.testing.assert_array_equal(
        ds.node_labels[:N_ALLX], truth["labels"][:N_ALLX]
    )
    for i in TEST_IDS:
        assert ds.node_labels[i] == truth["labels"][i]
    assert ds.train_mask.sum() == N_TRAIN and ds.train_mask[:N_TRAIN].all()
    assert ds.test_mask.sum() == len(TEST_IDS)
    assert set(np.nonzero(ds.test_mask)[0]) == set(TEST_IDS)
    assert not (ds.train_mask & ds.test_mask).any()


def test_planetoid_graph_symmetrized(fixture_dir):
    d, truth = fixture_dir
    ds = load_planetoid("cora", data_dir=d)
    src, dst = ds.graph.edge_arrays()
    pairs = set(zip(src.tolist(), dst.tolist()))
    for u, vs in truth["graph"].items():
        for v in vs:
            assert (u, v) in pairs and (v, u) in pairs
    # undirected simple graph: every edge in both directions, no self-loops
    assert all((v, u) in pairs for u, v in pairs)
    assert all(u != v for u, v in pairs)


def test_planetoid_end_to_end_node_training(fixture_dir):
    """cli/train_node path on the fixture: loss finite, accuracy in [0,1]."""
    d, _ = fixture_dir
    from graph_transformer_tpu.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )
    from graph_transformer_tpu.train.node_trainer import NodeTrainer

    ds = load_planetoid("cora", data_dir=d)
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=4, num_neighbors=4),
        model=ModelConfig(
            num_timesteps=1, num_hidden_layers=1, ff_hidden_size=16,
            sampled_num=8,
        ),
        train=TrainConfig(num_epochs=3),
    )
    tr = NodeTrainer(ds, cfg)
    losses = [tr.train_epoch() for _ in range(3)]
    assert all(np.isfinite(losses))
    acc = tr.evaluate_masks()
    assert 0.0 <= acc <= 1.0


# ----------------------------------------------------------------------- PPI
def _write_ppi_fixture(d: str) -> dict:
    """Tiny train split in the GraphSAGE/DGL ppi.zip layout: two graphs of
    5 and 4 nodes, 3 feature dims, 4-way multilabels."""
    import json

    rng = np.random.default_rng(1)
    n = 9
    graph_ids = np.array([7, 7, 7, 7, 7, 9, 9, 9, 9])
    feats = rng.random((n, 3)).astype(np.float32)
    labels = (rng.random((n, 4)) < 0.4).astype(np.float32)
    links = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 4),  # graph 7
             (5, 6), (6, 7), (7, 8)]  # graph 9
    gjson = {
        "directed": False, "multigraph": False,
        "nodes": [{"id": i} for i in range(n)],
        "links": [{"source": s, "target": t} for s, t in links],
    }
    with open(os.path.join(d, "train_graph.json"), "w") as f:
        json.dump(gjson, f)
    np.save(os.path.join(d, "train_feats.npy"), feats)
    np.save(os.path.join(d, "train_labels.npy"), labels)
    np.save(os.path.join(d, "train_graph_id.npy"), graph_ids)
    return {"feats": feats, "labels": labels, "links": links}


def test_ppi_loader_first_graph(tmp_path):
    from graph_transformer_tpu.data.citation import load_ppi

    truth = _write_ppi_fixture(str(tmp_path))
    ds = load_ppi(data_dir=str(tmp_path), split="train", graph_index=0)
    assert ds.num_nodes == 5  # the graph_id==7 block
    np.testing.assert_allclose(ds.graph.node_feat, truth["feats"][:5])
    np.testing.assert_array_equal(
        ds.node_labels, truth["labels"][:5].argmax(axis=1)
    )
    src, dst = ds.graph.edge_arrays()
    pairs = set(zip(src.tolist(), dst.tolist()))
    for s, t in truth["links"][:5]:
        assert (s, t) in pairs and (t, s) in pairs
    assert len(pairs) == 10  # 5 undirected edges, both directions


def test_ppi_loader_second_graph(tmp_path):
    from graph_transformer_tpu.data.citation import load_ppi

    truth = _write_ppi_fixture(str(tmp_path))
    ds = load_ppi(data_dir=str(tmp_path), split="train", graph_index=1)
    assert ds.num_nodes == 4
    np.testing.assert_allclose(ds.graph.node_feat, truth["feats"][5:])
    src, dst = ds.graph.edge_arrays()
    pairs = set(zip(src.tolist(), dst.tolist()))
    # node ids remapped to 0..3
    assert (0, 1) in pairs and (2, 3) in pairs
