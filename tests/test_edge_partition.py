"""Edge-partitioned DP + halo exchange on the 8-device virtual CPU mesh."""

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from graph_transformer_tpu.config import ModelConfig
from graph_transformer_tpu.data.tu import synthetic_powerlaw_dataset
from graph_transformer_tpu.models.u2gnn_sup import U2GNNSup
from graph_transformer_tpu.ops.losses import label_smoothing, soft_cross_entropy
from graph_transformer_tpu.parallel.edge_partition import (
    ShardedBatchBuilder,
    build_halo_plan,
    edge_balance,
    halo_gather,
    make_shard_map_train_step,
    partition_graphs_by_edges,
)
from graph_transformer_tpu.parallel.mesh import make_mesh
from graph_transformer_tpu.train.optim import make_optimizer


@pytest.fixture(scope="module")
def ds():
    return synthetic_powerlaw_dataset(num_graphs=32, mean_nodes=60, seed=0)


def test_partition_balances_edges(ds):
    shards = partition_graphs_by_edges(ds, np.arange(32), 4)
    assert sum(len(s) for s in shards) == 32
    assert len(np.unique(np.concatenate(shards))) == 32
    assert edge_balance(ds, shards) < 1.2  # LPT within 20% of perfect


def test_sharded_builder_shapes(ds):
    sb = ShardedBatchBuilder(ds, n_shards=4, batch_size=4, num_neighbors=4,
                             pad_multiple=64, seed=0)
    b = sb.sample()
    assert b.x.shape[0] == 4  # shard axis
    assert b.labels.shape == (4, 4)
    assert b.neigh.shape[2] == 5


def test_shard_map_dp_step_matches_replicated_gradients(ds):
    """The psum'd sharded gradient equals the single-device gradient on the
    concatenation of all shards' batches."""
    n_shards = 4
    mesh = make_mesh(model_parallel=1, devices=jax.devices()[:n_shards])
    cfg = ModelConfig(num_timesteps=1, num_hidden_layers=1, ff_hidden_size=16)
    model = U2GNNSup(ds.feature_dim, ds.num_classes, cfg)
    params = model.init(jax.random.key(0))
    opt = make_optimizer(1e-3)
    opt_state = opt.init(params)

    sb = ShardedBatchBuilder(ds, n_shards, batch_size=4, num_neighbors=4,
                            pad_multiple=64, seed=0)
    stacked = sb.build([np.arange(i * 8, i * 8 + 4) for i in range(n_shards)])

    def loss_fn(p, local, key):
        del key
        scores = model.apply(p, local, rng=None)
        t = label_smoothing(local.labels, ds.num_classes, 0.1)
        # sum convention: psum over shards == global sum
        logp = jax.nn.log_softmax(scores, axis=-1)
        return -jnp.sum(t * logp)

    step = make_shard_map_train_step(loss_fn, opt, mesh, donate=False)
    with mesh:
        p1, s1, loss = step(params, opt_state, stacked, jax.random.key(1))
    assert np.isfinite(float(loss))

    # reference: sum of per-shard losses on one device
    total = 0.0
    grads_sum = jax.tree_util.tree_map(jnp.zeros_like, params)
    for i in range(n_shards):
        local = jax.tree_util.tree_map(lambda x: x[i], stacked)
        l, g = jax.value_and_grad(loss_fn)(params, local, None)
        total += float(l)
        grads_sum = jax.tree_util.tree_map(lambda a, b: a + b, grads_sum, g)
    assert abs(float(loss) - total) / abs(total) < 1e-4
    updates, _ = opt.update(grads_sum, opt.init(params), params)
    p_ref = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_halo_plan_and_gather_match_direct():
    """halo_gather over the mesh == direct global gather x[neigh]."""
    n_shards, n_local, k1, d = 4, 8, 3, 5
    n = n_shards * n_local
    rng = np.random.default_rng(0)
    neigh = rng.integers(0, n, size=(n, k1)).astype(np.int32)
    neigh[:, 0] = np.arange(n)
    plan = build_halo_plan(neigh, n_shards)

    x = rng.standard_normal((n, d)).astype(np.float32)
    want = x[neigh]  # [N, K1, D]

    mesh = make_mesh(model_parallel=1, devices=jax.devices()[:n_shards])

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("data"), P(), P("data"), P("data"), P("data")),
        out_specs=P("data"),
        check_vma=False,
    )
    def run(x_local, export_idx, imp_src, imp_row, imp_loc):
        return halo_gather(
            x_local, export_idx, imp_src[0], imp_row[0], imp_loc[0]
        )

    got = run(
        jnp.asarray(x),
        plan.export_idx,
        plan.import_src,
        plan.import_row,
        plan.import_local,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_halo_plan_export_buffers_minimal():
    """Rows never referenced remotely are not exported (beyond padding)."""
    n_shards, n_local = 2, 4
    n = n_shards * n_local
    # shard 0 nodes reference only their own shard; shard 1 references row 0
    # of shard 0 in every slot
    neigh = np.tile(np.arange(n, dtype=np.int32)[:, None], (1, 2))
    neigh[n_local:, 1] = 0
    plan = build_halo_plan(neigh, n_shards)
    # exactly one row (shard 0's row 0) is referenced remotely — own-shard
    # references never enter the export buffer
    assert plan.halo_size == 1


def test_halo_train_step_matches_single_device():
    """Regime-2 FULL train step (node-partitioned encoder + halo exchange +
    sampled softmax + grad psum) reproduces the single-device computation:
    same loss, same updated params."""
    import optax

    from graph_transformer_tpu.ops.attention import neighborhood_encoder
    from graph_transformer_tpu.ops.sampled_softmax import sampled_softmax_loss
    from graph_transformer_tpu.parallel.edge_partition import (
        init_halo_unsup_params,
        make_halo_train_step,
    )
    from graph_transformer_tpu.sampling.log_uniform import LogUniformSpec

    n_shards, n_local, K, d, ff, layers, nsampled = 4, 8, 3, 8, 16, 2, 8
    n = n_shards * n_local
    rng = np.random.default_rng(3)
    neigh = rng.integers(0, n, size=(n, K + 1)).astype(np.int32)
    neigh[:, 0] = np.arange(n)
    plan = build_halo_plan(neigh, n_shards)
    x = rng.standard_normal((n, d)).astype(np.float32)

    params = init_halo_unsup_params(
        jax.random.key(0), layers, d, ff, n, num_timesteps=1
    )
    # sgd: the update is linear in the gradient, so FP summation-order noise
    # between psum-of-partials and the single-device sum stays proportional
    # (adam's g/(|g|+eps) blows up relative error on near-zero gradients)
    opt = optax.sgd(1e-2)
    opt_state = opt.init(params)

    mesh = make_mesh(model_parallel=1, devices=jax.devices()[:n_shards])
    step = make_halo_train_step(
        opt, mesh, n, nsampled, num_timesteps=1, donate=False,
        deterministic=True,
    )
    key = jax.random.key(7)
    p1, _, loss = step(params, opt_state, jnp.asarray(x), plan, key)

    # ---- single-device reference: global gathers, same candidate draw ----
    k_cand, _ = jax.random.split(key)
    spec = LogUniformSpec.create(n, nsampled)

    def ref_loss(p):
        h = jnp.asarray(x)
        for enc in p.encoders:
            h = neighborhood_encoder(
                enc, h[jnp.asarray(neigh)], dropout_rate=0.5, rng=None,
                num_timesteps=1,
            )
        losses = sampled_softmax_loss(
            p.ss, k_cand, h, jnp.arange(n, dtype=jnp.int32), spec
        )
        return jnp.sum(losses)

    want_loss, grads = jax.value_and_grad(ref_loss)(params)
    assert float(loss) == pytest.approx(float(want_loss), rel=1e-4)
    updates, _ = opt.update(grads, opt.init(params), params)
    p_ref = jax.tree_util.tree_map(lambda a, u: a + u, params, updates)
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
        )


def test_halo_cost_model_sane():
    """Collective bytes scale with halo size and shard count; predicted
    efficiency is in (0, 1] and decreases as the halo grows."""
    from graph_transformer_tpu.parallel.edge_partition import halo_cost_model

    n_shards, n_local, K = 4, 256, 8
    n = n_shards * n_local
    rng = np.random.default_rng(0)
    # local-heavy neighborhoods: mostly own-shard references -> small halo
    base = (np.arange(n, dtype=np.int32) // n_local) * n_local
    neigh_local = (base[:, None]
                   + rng.integers(0, n_local, (n, K + 1))).astype(np.int32)
    neigh_local[:, 0] = np.arange(n)
    # scattered neighborhoods: uniform references -> big halo
    neigh_glob = rng.integers(0, n, (n, K + 1)).astype(np.int32)
    neigh_glob[:, 0] = np.arange(n)

    m_loc = halo_cost_model(build_halo_plan(neigh_local, n_shards),
                            n_local, 64, 1, 1024)
    m_glob = halo_cost_model(build_halo_plan(neigh_glob, n_shards),
                             n_local, 64, 1, 1024)
    # all-local references: halo is padding only (H=1)
    assert m_loc["halo_rows_per_shard"] == 1
    assert m_loc["collective_bytes_per_step"] < (
        m_glob["collective_bytes_per_step"] / 50
    )
    assert m_glob["collective_bytes_per_step"] > 0
    assert 0 < m_glob["predicted_efficiency"] <= 1.0
    assert m_loc["predicted_efficiency"] > 0.99
    # doubling layers doubles collective traffic
    m2 = halo_cost_model(build_halo_plan(neigh_glob, n_shards),
                         n_local, 64, 2, 1024)
    assert m2["collective_bytes_per_step"] == 2 * m_glob["collective_bytes_per_step"]


# ---------------------------------------------------------------- round 4
def test_partition_nodes_by_edges_balances_edges():
    """Contiguous cuts by cumulative degree: each range carries ~1/S of the
    edges even on a power-law degree sequence (SURVEY 7.3#4)."""
    from graph_transformer_tpu.parallel.edge_partition import (
        partition_nodes_by_edges,
    )

    rng = np.random.default_rng(0)
    deg = np.sort(rng.zipf(1.7, size=4096).clip(max=2000))[::-1]
    part = partition_nodes_by_edges(deg, 8)
    loads = np.array([
        deg[part.cuts[s]:part.cuts[s + 1]].sum() for s in range(8)
    ])
    assert loads.max() / loads.mean() < 1.35  # hubs bound the granularity
    # equal-node split for comparison: hub shard is far heavier
    naive = np.array([a.sum() for a in np.array_split(deg, 8)])
    assert naive.max() / naive.mean() > 2.0
    # renumbering is a bijection on real nodes
    assert len(np.unique(part.new_of_old)) == len(deg)
    back = part.old_of_new[part.new_of_old]
    np.testing.assert_array_equal(back, np.arange(len(deg)))
    assert part.valid.sum() == len(deg)
    assert part.num_new_nodes % 8 == 0


def test_apply_node_partition_remaps_consistently():
    from graph_transformer_tpu.parallel.edge_partition import (
        apply_node_partition,
        partition_nodes_by_edges,
    )

    rng = np.random.default_rng(1)
    n, k1, d = 37, 4, 3
    deg = rng.integers(1, 30, n)
    neigh = rng.integers(0, n, (n, k1)).astype(np.int32)
    neigh[:, 0] = np.arange(n)
    x = rng.standard_normal((n, d)).astype(np.float32)
    part = partition_nodes_by_edges(deg, 4)
    neigh_new, x_new = apply_node_partition(part, neigh, x)
    # features land at the renumbered slots
    np.testing.assert_array_equal(x_new[part.new_of_old], x)
    # neighbor gather is invariant under the renumbering
    np.testing.assert_array_equal(
        x_new[neigh_new[part.new_of_old]], x[neigh]
    )
    # padding rows: self-only neighborhoods
    pad = ~part.valid
    if pad.any():
        rows = np.nonzero(pad)[0]
        np.testing.assert_array_equal(
            neigh_new[rows], np.tile(rows[:, None], (1, k1))
        )


def test_halo_overlap_forward_matches_blocking():
    """The overlapped interior/boundary schedule computes row-for-row the
    same math as the blocking halo_gather + whole-shard encode; the only
    residue is XLA's shape-dependent vectorization of the row-internal
    reductions (measured ~1e-7 — same-op-different-lane-order float
    noise, not a schedule difference)."""
    from graph_transformer_tpu.ops.attention import neighborhood_encoder
    from graph_transformer_tpu.parallel.edge_partition import (
        build_overlap_plan,
        halo_unsup_forward_local,
        init_halo_unsup_params,
    )

    n_shards, n_local, K, d, ff = 4, 16, 3, 8, 16
    n = n_shards * n_local
    rng = np.random.default_rng(5)
    # mixed locality: half the slots local, half global
    neigh = rng.integers(0, n, size=(n, K + 1)).astype(np.int32)
    local_base = (np.arange(n) // n_local) * n_local
    neigh[:, 1] = local_base + rng.integers(0, n_local, n)
    neigh[:, 0] = np.arange(n)
    plan = build_halo_plan(neigh, n_shards)
    oplan = build_overlap_plan(plan)
    x = rng.standard_normal((n, d)).astype(np.float32)
    params = init_halo_unsup_params(jax.random.key(0), 2, d, ff, n)

    mesh = make_mesh(model_parallel=1, devices=jax.devices()[:n_shards])

    def run(overlapped):
        @partial(
            shard_map, mesh=mesh,
            in_specs=(P("data"), P(), P("data"), P("data"), P("data"),
                      P("data"), P("data")),
            out_specs=P("data"),
            check_vma=False,
        )
        def fwd(x_local, export_idx, imp_src, imp_row, imp_loc, ir, br):
            return halo_unsup_forward_local(
                params, x_local, export_idx, imp_src[0], imp_row[0],
                imp_loc[0], num_timesteps=1, rng=None,
                interior_rows=ir[0] if overlapped else None,
                boundary_rows=br[0] if overlapped else None,
            )

        return np.asarray(fwd(
            jnp.asarray(x), plan.export_idx, plan.import_src,
            plan.import_row, plan.import_local,
            oplan.interior_rows, oplan.boundary_rows,
        ))

    blocking = run(False)
    overlapped = run(True)
    np.testing.assert_allclose(overlapped, blocking, rtol=1e-5, atol=1e-6)


def test_halo_overlap_train_step_matches_blocking_loss():
    """Regime-3 (overlapped) full train step reproduces the regime-2
    (blocking) step: same loss, same updated params (the VERDICT item-1
    correctness bar; agreement is to float precision — the schedules are
    op-identical per row, XLA vectorization leaves ~1e-7 noise)."""
    import optax

    from graph_transformer_tpu.parallel.edge_partition import (
        build_overlap_plan,
        init_halo_unsup_params,
        make_halo_train_step,
    )

    n_shards, n_local, K, d, ff, nsampled = 4, 8, 3, 8, 16, 8
    n = n_shards * n_local
    rng = np.random.default_rng(3)
    neigh = rng.integers(0, n, size=(n, K + 1)).astype(np.int32)
    neigh[:, 0] = np.arange(n)
    plan = build_halo_plan(neigh, n_shards)
    oplan = build_overlap_plan(plan)
    x = rng.standard_normal((n, d)).astype(np.float32)
    params = init_halo_unsup_params(jax.random.key(0), 2, d, ff, n)
    opt = optax.sgd(1e-2)

    mesh = make_mesh(model_parallel=1, devices=jax.devices()[:n_shards])
    key = jax.random.key(7)
    step2 = make_halo_train_step(opt, mesh, n, nsampled, num_timesteps=1,
                                 donate=False, deterministic=True)
    p2, _, loss2 = step2(params, opt.init(params), jnp.asarray(x), plan, key)
    step3 = make_halo_train_step(opt, mesh, n, nsampled, num_timesteps=1,
                                 donate=False, deterministic=True,
                                 overlap=True)
    valid = jnp.ones((n,), jnp.float32)
    p3, _, loss3 = step3(params, opt.init(params), jnp.asarray(x), plan,
                         oplan, valid, key)
    assert float(loss3) == pytest.approx(float(loss2), rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p3),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_halo_overlap_step_with_edge_balanced_partition():
    """End-to-end regime 3 on an edge-balanced padded partition: the masked
    loss equals a single-device reference over the REAL nodes only."""
    import optax

    from graph_transformer_tpu.ops.attention import neighborhood_encoder
    from graph_transformer_tpu.ops.sampled_softmax import (
        sampled_softmax_loss,
    )
    from graph_transformer_tpu.parallel.edge_partition import (
        apply_node_partition,
        build_overlap_plan,
        init_halo_unsup_params,
        make_halo_train_step,
        partition_nodes_by_edges,
    )
    from graph_transformer_tpu.sampling.log_uniform import LogUniformSpec

    n_shards, K, d, ff, nsampled = 4, 3, 8, 16, 8
    rng = np.random.default_rng(11)
    n_old = 29  # deliberately not divisible by n_shards
    deg = rng.zipf(1.8, n_old).clip(max=50)
    neigh = rng.integers(0, n_old, size=(n_old, K + 1)).astype(np.int32)
    neigh[:, 0] = np.arange(n_old)
    x_old = rng.standard_normal((n_old, d)).astype(np.float32)

    part = partition_nodes_by_edges(deg, n_shards, pad_multiple=2)
    neigh_new, x_new = apply_node_partition(part, neigh, x_old)
    n = part.num_new_nodes
    plan = build_halo_plan(neigh_new, n_shards)
    oplan = build_overlap_plan(plan)
    params = init_halo_unsup_params(jax.random.key(0), 2, d, ff, n)
    opt = optax.sgd(1e-2)

    mesh = make_mesh(model_parallel=1, devices=jax.devices()[:n_shards])
    step = make_halo_train_step(opt, mesh, n, nsampled, num_timesteps=1,
                                donate=False, deterministic=True,
                                overlap=True)
    key = jax.random.key(2)
    valid = jnp.asarray(part.valid.astype(np.float32))
    _, _, loss = step(params, opt.init(params), jnp.asarray(x_new), plan,
                      oplan, valid, key)

    # single-device reference over the new id space, masked to real nodes
    k_cand, _ = jax.random.split(key)
    spec = LogUniformSpec.create(n, nsampled)
    h = jnp.asarray(x_new)
    for enc in params.encoders:
        h = neighborhood_encoder(enc, h[jnp.asarray(neigh_new)],
                                 dropout_rate=0.5, rng=None,
                                 num_timesteps=1)
    losses = sampled_softmax_loss(
        params.ss, k_cand, h, jnp.arange(n, dtype=jnp.int32), spec
    )
    want = float(jnp.sum(losses * valid))
    assert float(loss) == pytest.approx(want, rel=1e-5)

    # masked BLOCKING step (the overlapped step's parity twin on padded
    # partitions — what dryrun_multichip's regime-3 self-check runs):
    # same masked loss, same updated params
    mstep = make_halo_train_step(opt, mesh, n, nsampled, num_timesteps=1,
                                 donate=False, deterministic=True,
                                 masked=True)
    pm, _, mloss = mstep(params, opt.init(params), jnp.asarray(x_new),
                         plan, valid, key)
    assert float(mloss) == pytest.approx(float(loss), rel=1e-6)
    po, _, _ = step(params, opt.init(params), jnp.asarray(x_new), plan,
                    oplan, valid, key)
    for a, b in zip(jax.tree_util.tree_leaves(pm),
                    jax.tree_util.tree_leaves(po)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_cost_model_overlap_raises_efficiency():
    from graph_transformer_tpu.parallel.edge_partition import (
        build_halo_plan,
        halo_cost_model,
    )

    n_shards, n_local, K = 8, 256, 8
    n = n_shards * n_local
    rng = np.random.default_rng(0)
    # 80% local slots: enough interior rows to hide the exchange under
    neigh = rng.integers(0, n, (n, K + 1)).astype(np.int32)
    base = (np.arange(n, dtype=np.int32) // n_local) * n_local
    mask = rng.random((n, K + 1)) < 0.8
    neigh = np.where(
        mask, base[:, None] + rng.integers(0, n_local, (n, K + 1)), neigh
    ).astype(np.int32)
    neigh[:, 0] = np.arange(n)
    m = halo_cost_model(build_halo_plan(neigh, n_shards),
                        n_local, 4, 1, 1024)
    assert 0 < m["interior_fraction"] < 1
    assert m["predicted_efficiency_overlap"] >= m["predicted_efficiency"]
    assert m["predicted_efficiency_overlap"] <= 1.0


def test_min_crossing_cuts_land_between_graphs():
    """With the neighborhood table supplied, cut points slide to reference-
    free positions: on a graph-contiguous dataset the halo disappears
    (measured on the power-law anchor: H 77 -> 1 at S=8,
    runs/halo_anchor.json partition_comparison_r4)."""
    from graph_transformer_tpu.parallel.edge_partition import (
        apply_node_partition,
        build_halo_plan,
        partition_nodes_by_edges,
    )

    rng = np.random.default_rng(2)
    # 4 graphs of 10 nodes each, all neighbor refs within the own graph
    n, g_sz = 40, 10
    base = (np.arange(n) // g_sz) * g_sz
    neigh = (base[:, None] + rng.integers(0, g_sz, (n, 4))).astype(np.int32)
    neigh[:, 0] = np.arange(n)
    deg = np.ones(n, dtype=np.int64)
    x = rng.standard_normal((n, 3)).astype(np.float32)

    part_plain = partition_nodes_by_edges(deg, 2, pad_multiple=2)
    part_mc = partition_nodes_by_edges(deg, 2, pad_multiple=2, neigh=neigh,
                                       crossing_window=0.3)
    neigh_p, _ = apply_node_partition(part_plain, neigh, x)
    neigh_m, _ = apply_node_partition(part_mc, neigh, x)
    h_plain = build_halo_plan(neigh_p, 2).halo_size
    h_mc = build_halo_plan(neigh_m, 2).halo_size
    assert h_mc <= h_plain
    # min-crossing cuts are reference-free: every cut sits at a multiple of
    # the graph size (between graphs)
    assert all(c % g_sz == 0 for c in part_mc.cuts), part_mc.cuts
