"""Pallas neighborhood sampler (sampling/pallas_sampler.py).

Table construction is host numpy (tested everywhere); the kernel itself
needs the TPU PRNG, so the sampling tests skip off-TPU (they ran on the
v5e during round 3 — membership exact for all spot-checked nodes, hub
coverage ≈ degree; see BASELINE.md round-3 notes).
"""

import numpy as np
import pytest

from graph_transformer_tpu.data.tu import load_tu_dataset, synthetic_powerlaw_dataset
from graph_transformer_tpu.ops.pallas_ffn import on_tpu
from graph_transformer_tpu.sampling.pallas_sampler import (
    TABLE_WIDTH,
    build_neighbor_table,
)


def test_table_rows_tile_neighbor_lists():
    ds = load_tu_dataset("MUTAG")
    table = build_neighbor_table(ds)
    assert table is not None and table.shape == (ds.num_nodes, TABLE_WIDTH)
    for v in (0, 5, ds.num_nodes - 1):
        s, e = ds.nbr_offsets[v], ds.nbr_offsets[v + 1]
        nbrs = ds.nbr_ids[s:e]
        if e > s:
            # row = neighbor list tiled: every entry is a real neighbor and
            # each neighbor appears floor/ceil(128/deg) times
            assert set(table[v]) == set(nbrs.tolist())
            counts = np.bincount(
                np.searchsorted(np.sort(nbrs), table[v]),
                minlength=len(nbrs),
            )
            assert counts.min() >= TABLE_WIDTH // len(nbrs)
        else:
            assert np.all(table[v] == v)


def test_hub_rows_subsample_neighbor_list():
    """Degree > 128 rows (heavy-tail regime): the table row is a uniform
    with-replacement subsample of the TRUE neighbor list — membership
    exact, and every entry a real neighbor — and refresh_hub_rows
    re-draws exactly those rows."""
    from graph_transformer_tpu.sampling.pallas_sampler import (
        refresh_hub_rows,
    )

    ds = synthetic_powerlaw_dataset(num_graphs=4, mean_nodes=400,
                                    attach_edges=60, seed=3)
    if int(ds.degrees.max()) <= TABLE_WIDTH:
        pytest.skip("synthetic graph stayed under the width")
    table = build_neighbor_table(ds)
    assert table.shape == (ds.num_nodes, TABLE_WIDTH)
    hubs = np.flatnonzero(ds.degrees > TABLE_WIDTH)
    assert hubs.size > 0
    for v in hubs[:5]:
        s, e = ds.nbr_offsets[v], ds.nbr_offsets[v + 1]
        assert set(table[v]) <= set(ds.nbr_ids[s:e].tolist())
        # with-replacement subsample of >128 neighbors: expect many
        # distinct entries (not a single repeated id)
        assert len(set(table[v])) > TABLE_WIDTH // 2
    # non-hub rows keep the exact tiled layout
    nonhub = int(np.flatnonzero(
        (ds.degrees > 0) & (ds.degrees <= TABLE_WIDTH))[0])
    s, e = ds.nbr_offsets[nonhub], ds.nbr_offsets[nonhub + 1]
    assert set(table[nonhub]) == set(ds.nbr_ids[s:e].tolist())
    t2 = refresh_hub_rows(table, ds, seed=99)
    assert not np.array_equal(t2[hubs[0]], table[hubs[0]])
    np.testing.assert_array_equal(t2[nonhub], table[nonhub])
    s, e = ds.nbr_offsets[hubs[0]], ds.nbr_offsets[hubs[0] + 1]
    assert set(t2[hubs[0]]) <= set(ds.nbr_ids[s:e].tolist())


@pytest.mark.skipif(not on_tpu(), reason="kernel needs the TPU PRNG")
def test_sampled_ids_are_neighbors():
    import jax
    import jax.numpy as jnp

    from graph_transformer_tpu.sampling.pallas_sampler import (
        sample_neighbor_table,
    )

    ds = load_tu_dataset("MUTAG")
    table = jnp.asarray(build_neighbor_table(ds))
    deg = jnp.asarray(ds.degrees, jnp.int32)[:, None]
    out = np.asarray(sample_neighbor_table(jnp.int32(7), table, deg))
    for v in range(0, ds.num_nodes, 97):
        s, e = ds.nbr_offsets[v], ds.nbr_offsets[v + 1]
        allowed = set(ds.nbr_ids[s:e].tolist()) if e > s else {v}
        assert set(out[v].tolist()) <= allowed


@pytest.mark.skipif(not on_tpu(), reason="kernel needs the TPU PRNG")
def test_sampled_ids_are_neighbors_heavy_tail():
    """Hub rows (degree > 128, unclamped deg passed in): the kernel clamps
    to the table width and every sampled id is still a TRUE neighbor."""
    import jax.numpy as jnp

    from graph_transformer_tpu.sampling.pallas_sampler import (
        sample_neighbor_table,
    )

    ds = synthetic_powerlaw_dataset(num_graphs=4, mean_nodes=400,
                                    attach_edges=60, seed=3)
    hubs = np.flatnonzero(ds.degrees > TABLE_WIDTH)
    if hubs.size == 0:
        pytest.skip("synthetic graph stayed under the width")
    table = jnp.asarray(build_neighbor_table(ds))
    deg = jnp.asarray(ds.degrees, jnp.int32)[:, None]  # true (unclamped)
    out = np.asarray(sample_neighbor_table(jnp.int32(11), table, deg))
    for v in list(hubs[:3]) + list(range(0, ds.num_nodes, 211)):
        s, e = ds.nbr_offsets[v], ds.nbr_offsets[v + 1]
        allowed = set(ds.nbr_ids[s:e].tolist()) if e > s else {v}
        assert set(out[v].tolist()) <= allowed


def test_unsup_loss_neigh_feat_plumbing():
    """U2GNNUnsup.loss(neigh_feat=...) ≡ the batch.neigh gather when handed
    the same neighborhoods' features (the fast-sampler contract: features
    pre-gathered from the global table replace the batch-local gather)."""
    import jax
    import jax.numpy as jnp

    from graph_transformer_tpu.config import (
        DataConfig, ExperimentConfig, ModelConfig, TrainConfig,
    )
    from graph_transformer_tpu.data.batching import BatchBuilder
    from graph_transformer_tpu.models.u2gnn_unsup import U2GNNUnsup

    ds = load_tu_dataset("MUTAG")
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=4, num_neighbors=4),
        model=ModelConfig(num_timesteps=1, num_hidden_layers=1,
                          ff_hidden_size=16, sampled_num=8),
        train=TrainConfig(num_epochs=1),
    )
    builder = BatchBuilder(ds, batch_size=4, num_neighbors=4, seed=0)
    batch = builder.sample()
    model = U2GNNUnsup(ds.feature_dim, ds.num_nodes, cfg.model)
    params = model.init(jax.random.key(0))
    spec = model.spec()
    key = jax.random.key(1)
    # features of the already-sampled local neighborhoods, via the GLOBAL
    # table (what resample_batch_neighbors_fast + x_global[neigh_g] yields)
    neigh_g = np.asarray(batch.node_gidx)[np.asarray(batch.neigh)]
    nf = jnp.asarray(ds.node_feat)[jnp.asarray(neigh_g)]
    l_local = model.loss(params, batch, key, spec, rng=None)
    l_fast = model.loss(params, batch, key, spec, rng=None, neigh_feat=nf)
    np.testing.assert_allclose(
        np.asarray(l_fast), np.asarray(l_local), rtol=1e-5
    )
