"""Statistical tests for on-device samplers.

The log-uniform sampler is validated against the closed-form Zipfian law the
C++ reference implements (``Log_Uniform_Sampler.cpp:14``):
P(k) = (log(k+2)-log(k+1))/log(N+1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_transformer_tpu.data.batching import BatchBuilder
from graph_transformer_tpu.sampling.log_uniform import (
    LogUniformSpec,
    expected_count,
    expected_num_tries,
    log_uniform_probs,
    sample_log_uniform_fast,
    sample_log_uniform_unique,
)
from graph_transformer_tpu.sampling.neighbors import (
    DeviceCSR,
    resample_batch_neighbors,
    sample_neighborhoods,
)


def test_log_uniform_probs_normalized():
    p = np.asarray(log_uniform_probs(1000))
    assert abs(p.sum() - 1.0) < 1e-5
    assert np.all(np.diff(p) < 0)  # strictly decreasing


def test_unique_sampler_is_unique_and_in_range():
    ids = np.asarray(sample_log_uniform_unique(jax.random.key(0), 500, 64))
    assert len(np.unique(ids)) == 64
    assert ids.min() >= 0 and ids.max() < 500


def test_unique_sampler_distribution():
    """Aggregate frequencies over many draws match the Zipfian head."""
    V, S, R = 2000, 32, 300
    counts = np.zeros(V)
    for r in range(R):
        ids = np.asarray(sample_log_uniform_unique(jax.random.key(r), V, S))
        counts[ids] += 1
    p = np.asarray(log_uniform_probs(V), dtype=np.float64)
    t = expected_num_tries(V, S)
    expect = np.asarray(expected_count(t, jnp.asarray(p))) * R
    # head classes have high expected counts — compare within 15%
    head = expect > 30
    assert head.sum() > 5
    rel = np.abs(counts[head] - expect[head]) / expect[head]
    assert rel.mean() < 0.15


def test_expected_num_tries_consistent():
    V, S = 10_000, 512
    t = expected_num_tries(V, S)
    assert t >= S
    p = np.asarray(log_uniform_probs(V), dtype=np.float64)
    uniques = np.sum(1.0 - (1.0 - p) ** t)
    assert abs(uniques - S) < 1e-3


def test_fast_sampler_matches_unique_support():
    ids, valid = sample_log_uniform_fast(jax.random.key(3), 1000, 64)
    ids = np.asarray(ids)[np.asarray(valid)]
    assert len(np.unique(ids)) == len(ids)
    assert ids.min() >= 0 and ids.max() < 1000


def test_on_device_neighborhood_sampling(mutag):
    csr = DeviceCSR.from_dataset(mutag)
    nodes = jnp.arange(100, dtype=jnp.int32)
    neigh = np.asarray(sample_neighborhoods(jax.random.key(0), csr, nodes, 8))
    assert neigh.shape == (100, 9)
    np.testing.assert_array_equal(neigh[:, 0], np.arange(100))
    for v in range(100):
        s, e = mutag.nbr_offsets[v], mutag.nbr_offsets[v + 1]
        allowed = set(mutag.nbr_ids[s:e].tolist()) | {v}
        assert set(neigh[v].tolist()) <= allowed


def test_resample_batch_neighbors_respects_mask(mutag):
    bb = BatchBuilder(mutag, batch_size=4, num_neighbors=4, seed=0)
    b = bb.build([0, 1, 2, 3])
    csr = DeviceCSR.from_dataset(mutag)
    neigh = np.asarray(
        resample_batch_neighbors(
            jax.random.key(1), csr, b.node_gidx, b.node_mask, 4, mutag.num_nodes
        )
    )
    n_real = int(np.asarray(b.node_mask).sum())
    # padding rows self-point
    np.testing.assert_array_equal(
        neigh[n_real:], np.tile(np.arange(n_real, bb.n_pad)[:, None], (1, 5))
    )
    # real rows: all indices batch-local, inside the real region
    assert neigh[:n_real].max() < n_real
    # and map to true global neighbors
    gidx = np.asarray(b.node_gidx)
    for v in range(0, n_real, 11):
        g = gidx[v]
        s, e = mutag.nbr_offsets[g], mutag.nbr_offsets[g + 1]
        allowed = set(mutag.nbr_ids[s:e].tolist()) | {g}
        assert set(gidx[neigh[v]].tolist()) <= allowed
