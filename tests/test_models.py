"""Model-level tests: shapes, determinism, gradient flow, loss behavior."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_transformer_tpu.config import ModelConfig
from graph_transformer_tpu.data.batching import BatchBuilder, whole_dataset_batch
from graph_transformer_tpu.models.gat import GATModel
from graph_transformer_tpu.models.gcn import GCNModel
from graph_transformer_tpu.models.multilayer import (
    MultilayerU2GNN,
    build_multiplex_batch,
)
from graph_transformer_tpu.models.u2gnn_sup import U2GNNSup
from graph_transformer_tpu.models.u2gnn_unsup import U2GNNUnsup


@pytest.fixture(scope="module")
def sup_setup(mutag):
    cfg = ModelConfig(num_timesteps=2, num_hidden_layers=2, ff_hidden_size=32)
    bb = BatchBuilder(mutag, batch_size=4, num_neighbors=4, seed=0)
    batch = bb.build([0, 1, 2, 3])
    model = U2GNNSup(mutag.feature_dim, mutag.num_classes, cfg)
    params = model.init(jax.random.key(0))
    return model, params, batch


def test_sup_forward_shape(sup_setup):
    model, params, batch = sup_setup
    scores = model.apply(params, batch, rng=None)
    assert scores.shape == (4, 2)
    assert np.all(np.isfinite(np.asarray(scores)))


def test_sup_forward_deterministic_eval(sup_setup):
    model, params, batch = sup_setup
    a = np.asarray(model.apply(params, batch, rng=None))
    b = np.asarray(model.apply(params, batch, rng=None))
    np.testing.assert_array_equal(a, b)


def test_sup_dropout_varies(sup_setup):
    model, params, batch = sup_setup
    a = np.asarray(model.apply(params, batch, rng=jax.random.key(1)))
    b = np.asarray(model.apply(params, batch, rng=jax.random.key(2)))
    assert not np.allclose(a, b)


def test_sup_padding_invariance(mutag):
    """Padding rows must not affect scores: same graphs, different padding."""
    cfg = ModelConfig(num_timesteps=1, num_hidden_layers=1, ff_hidden_size=16)
    model = U2GNNSup(mutag.feature_dim, mutag.num_classes, cfg)
    params = model.init(jax.random.key(0))
    bb_small = BatchBuilder(mutag, batch_size=4, num_neighbors=4, pad_multiple=128, seed=7)
    bb_big = BatchBuilder(mutag, batch_size=4, num_neighbors=4, pad_multiple=256, seed=7)
    b1 = bb_small.build([0, 1, 2, 3])
    b2 = bb_big.build([0, 1, 2, 3])
    assert b1.n_pad != b2.n_pad
    s1 = np.asarray(model.apply(params, b1, rng=None))
    s2 = np.asarray(model.apply(params, b2, rng=None))
    # same neighborhood RNG seed -> same sampled neighborhoods for real rows
    np.testing.assert_allclose(s1, s2, rtol=1e-4, atol=1e-5)


def test_sup_gradients_nonzero(sup_setup):
    model, params, batch = sup_setup

    def loss_fn(p):
        return jnp.sum(model.apply(p, batch, rng=None) ** 2)

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_unsup_loss_finite_and_trains(mutag):
    cfg = ModelConfig(
        num_timesteps=1, num_hidden_layers=2, ff_hidden_size=16, sampled_num=32
    )
    model = U2GNNUnsup(mutag.feature_dim, mutag.num_nodes, cfg)
    params = model.init(jax.random.key(0))
    spec = model.spec()
    batch = whole_dataset_batch(mutag, num_neighbors=4)

    def loss_fn(p, key):
        return model.loss(p, batch, key, spec)

    l0 = float(loss_fn(params, jax.random.key(1)))
    assert np.isfinite(l0)
    # a few SGD steps reduce the loss
    g = jax.jit(jax.grad(loss_fn))
    p = params
    for i in range(5):
        grads = g(p, jax.random.key(10 + i))
        p = jax.tree_util.tree_map(lambda a, b: a - 1e-3 * b, p, grads)
    l1 = float(loss_fn(p, jax.random.key(1)))
    assert l1 < l0


def test_unsup_embedding_dim_concat(mutag):
    cfg = ModelConfig(num_timesteps=1, num_hidden_layers=3, ff_hidden_size=16)
    model = U2GNNUnsup(mutag.feature_dim, mutag.num_nodes, cfg)
    assert model.embedding_dim == 3 * mutag.feature_dim
    params = model.init(jax.random.key(0))
    assert params.ss.weight.shape == (mutag.num_nodes, 3 * mutag.feature_dim)


def test_unsup_cross_attention_head(mutag):
    cfg = ModelConfig(num_timesteps=1, num_hidden_layers=2, ff_hidden_size=16,
                      sampled_num=16)
    model = U2GNNUnsup(
        mutag.feature_dim, mutag.num_nodes, cfg, head="cross_attention"
    )
    params = model.init(jax.random.key(0))
    batch = whole_dataset_batch(mutag, num_neighbors=4)
    z = model.encode(params, batch, rng=None)
    assert z.shape == (batch.n_pad, mutag.feature_dim)


def test_gcn_gat_losses(mutag):
    batch = whole_dataset_batch(mutag, num_neighbors=4)
    for cls in (GCNModel, GATModel):
        cfg = ModelConfig(ff_hidden_size=16, sampled_num=32)
        model = cls(mutag.feature_dim, mutag.num_nodes, cfg)
        params = model.init(jax.random.key(0))
        spec = model.spec()
        loss = float(model.loss(params, batch, jax.random.key(1), spec))
        assert np.isfinite(loss)
        grads = jax.grad(
            lambda p: model.loss(p, batch, jax.random.key(1), spec)
        )(params)
        assert all(
            np.all(np.isfinite(np.asarray(l)))
            for l in jax.tree_util.tree_leaves(grads)
        )


def test_multilayer_siamese_and_multi(rng):
    N, D, S = 24, 8, 3
    adj = (rng.random((N, N, S)) < 0.15).astype(np.float32)
    adj = np.maximum(adj, adj.transpose(1, 0, 2))
    x = rng.random((N, D)).astype(np.float32)
    mb = build_multiplex_batch(x, adj, 4, rng)
    for mtype in ("siamese", "multi"):
        cfg = ModelConfig(
            num_timesteps=1, ff_hidden_size=16,
            loss_type="contrastive", ml_model_type=mtype,
        )
        model = MultilayerU2GNN(D, N, S, cfg)
        params = model.init(jax.random.key(0))
        n_enc = 1 if mtype == "siamese" else S
        assert len(params.encoders) == n_enc
        loss = float(model.loss(params, mb, rng=None))
        assert np.isfinite(loss)
    # gae loss path
    cfg = ModelConfig(num_timesteps=1, ff_hidden_size=16, loss_type="gae")
    model = MultilayerU2GNN(D, N, S, cfg)
    params = model.init(jax.random.key(1))
    assert np.isfinite(float(model.loss(params, mb, rng=None)))


def test_multilayer_projection_head(rng):
    N, D, S = 16, 8, 2
    adj = (rng.random((N, N, S)) < 0.2).astype(np.float32)
    adj = np.maximum(adj, adj.transpose(1, 0, 2))
    mb = build_multiplex_batch(rng.random((N, D)).astype(np.float32), adj, 2, rng)
    cfg = ModelConfig(
        num_timesteps=1, ff_hidden_size=16, loss_type="contrastive",
        projection_dim=4,
    )
    model = MultilayerU2GNN(D, N, S, cfg)
    params = model.init(jax.random.key(0))
    z = model.encode(params, mb, rng=None)
    assert z.shape == (N, 4)


def test_share_timestep_weights_universal_transformer(mutag):
    """UT recurrence: one stored layer replayed T times
    (tf.foldl weight sharing, ``universal_transformer_modified_utils.py:251-252``)."""
    cfg = ModelConfig(
        num_timesteps=3, num_hidden_layers=1, ff_hidden_size=16,
        share_timestep_weights=True,
    )
    model = U2GNNSup(mutag.feature_dim, mutag.num_classes, cfg)
    params = model.init(jax.random.key(0))
    assert params.encoders[0].w_in.shape[0] == 1  # single stored layer
    bb = BatchBuilder(mutag, batch_size=2, num_neighbors=2, seed=0)
    batch = bb.build([0, 1])
    scores = model.apply(params, batch, rng=None)
    assert scores.shape == (2, 2)


def test_sup_global_neigh_path_matches_local(mutag):
    """Fast-path equivalence for DEEP stacks (num_hidden_layers >= 2): a
    forward fed global neighbor ids (+ features gathered from the global
    table, re-gathers via ops.sparse.global_regather) must equal the
    batch-local ``batch.neigh`` forward with the same neighborhoods."""
    cfg = ModelConfig(num_timesteps=2, num_hidden_layers=3, ff_hidden_size=32)
    bb = BatchBuilder(mutag, batch_size=4, num_neighbors=4, seed=3)
    batch = bb.build([5, 6, 7, 8])
    model = U2GNNSup(mutag.feature_dim, mutag.num_classes, cfg)
    params = model.init(jax.random.key(2))

    a = model.apply(params, batch, rng=None)
    # same neighborhoods, expressed as global ids
    neigh_g = jnp.asarray(batch.node_gidx)[batch.neigh]
    x_global = jnp.asarray(mutag.node_feat, jnp.float32)
    b = model.apply(
        params, batch, rng=None,
        neigh_feat=x_global[neigh_g], neigh_global=neigh_g,
        num_total_nodes=mutag.num_nodes,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-5, rtol=1e-5)


def test_unsup_global_neigh_path_matches_local(mutag):
    """Same equivalence for the unsupervised encoder (concat head)."""
    cfg = ModelConfig(num_timesteps=1, num_hidden_layers=2,
                      ff_hidden_size=32, sampled_num=8)
    bb = BatchBuilder(mutag, batch_size=4, num_neighbors=4, seed=4)
    batch = bb.build([1, 2, 3, 4])
    model = U2GNNUnsup(mutag.feature_dim, mutag.num_nodes, cfg)
    params = model.init(jax.random.key(5))

    a = model.encode(params, batch, rng=None)
    neigh_g = jnp.asarray(batch.node_gidx)[batch.neigh]
    x_global = jnp.asarray(mutag.node_feat, jnp.float32)
    b = model.encode(
        params, batch, rng=None,
        neigh_feat=x_global[neigh_g], neigh_global=neigh_g,
        num_total_nodes=mutag.num_nodes,
    )
    # pad rows legitimately differ (their ``neigh`` points at batch-local
    # pad slots vs global id 0) and are masked out of every loss — compare
    # the real rows, like the 1-layer fast path's parity
    real = np.asarray(batch.node_mask) > 0
    np.testing.assert_allclose(np.asarray(a)[real], np.asarray(b)[real],
                               atol=1e-5, rtol=1e-5)
