"""Native C++ component tests: log-uniform sampler and batch assembler."""

import numpy as np
import pytest

from graph_transformer_tpu.data.batching import BatchBuilder
from graph_transformer_tpu.sampling.log_uniform import (
    expected_count,
    expected_num_tries,
    log_uniform_probs,
)

nat = pytest.importorskip("graph_transformer_tpu.native.log_uniform_native")

if not nat.available():  # pragma: no cover
    pytest.skip("native build unavailable", allow_module_level=True)


def test_native_probability_matches_closed_form():
    s = nat.LogUniformSampler(1000)
    # float64 closed form (the JAX helper computes in float32 on TPU/CPU)
    k64 = np.arange(1000, dtype=np.float64)
    p64 = (np.log(k64 + 2) - np.log(k64 + 1)) / np.log(1001.0)
    p32 = np.asarray(log_uniform_probs(1000))
    for k in [0, 1, 10, 500, 999]:
        assert abs(s.probability(k) - p64[k]) < 1e-14
        assert abs(s.probability(k) - p32[k]) < 1e-7


def test_native_unique_sampling():
    s = nat.LogUniformSampler(5000)
    ids, tries = s.sample_unique(256)
    assert len(np.unique(ids)) == 256
    assert ids.min() >= 0 and ids.max() < 5000
    assert tries >= 256
    # tries in family with the analytic estimate
    t_est = expected_num_tries(5000, 256)
    assert 0.5 * t_est < tries < 2.0 * t_est


def test_native_iid_distribution():
    """Empirical head frequencies match the Zipfian law."""
    s = nat.LogUniformSampler(1000)
    draws = s.sample_iid(200_000)
    p = np.asarray(log_uniform_probs(1000), dtype=np.float64)
    for k in range(5):
        emp = np.mean(draws == k)
        assert abs(emp - p[k]) / p[k] < 0.05


def test_native_expected_count_matches_jax():
    s = nat.LogUniformSampler(2000)
    ids = np.array([0, 5, 100, 1999])
    got = s.expected_count(500.0, ids)
    import jax.numpy as jnp

    want = np.asarray(
        expected_count(500.0, jnp.asarray(np.asarray(log_uniform_probs(2000))[ids]))
    )
    # float32 JAX vs float64 native: agree to single precision
    np.testing.assert_allclose(got, want, rtol=5e-4)


def test_native_accidental_matches():
    s = nat.LogUniformSampler(100)
    r, c = s.accidental_matches(np.array([3, 7, 9]), np.array([9, 3, 4]))
    assert set(zip(r.tolist(), c.tolist())) == {(0, 1), (2, 0)}


def test_native_reference_api_shape():
    s = nat.LogUniformSampler(1000)
    ids, true_freq, sample_freq = s.sample(64, labels=np.arange(10))
    assert ids.shape == (64,)
    assert true_freq.shape == (10,)
    assert sample_freq.shape == (64,)
    assert np.all((sample_freq > 0) & (sample_freq <= 1.0))


def test_native_batcher_matches_numpy(mutag):
    from graph_transformer_tpu.native import batcher

    if not batcher.available():
        pytest.skip("batcher unavailable")
    bn = BatchBuilder(mutag, 8, 4, seed=0, backend="native")
    bp = BatchBuilder(mutag, 8, 4, seed=0, backend="numpy")
    a = bn.build(np.arange(8))
    b = bp.build(np.arange(8))
    for f in ["x", "graph_id", "node_gidx", "node_mask",
              "edge_src", "edge_dst", "edge_mask", "labels"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f
        )
    # neighborhoods differ by RNG stream but must be valid graph neighbors
    n_real = int(np.asarray(a.node_mask).sum())
    neigh = np.asarray(a.neigh)[:n_real]
    gidx = np.asarray(a.node_gidx)[:n_real]
    np.testing.assert_array_equal(neigh[:, 0], np.arange(n_real))
    for v in range(0, n_real, 9):
        s, e = mutag.nbr_offsets[gidx[v]], mutag.nbr_offsets[gidx[v] + 1]
        allowed = set(mutag.nbr_ids[s:e].tolist()) | {gidx[v]}
        assert set(gidx[neigh[v]].tolist()) <= allowed
    # padding rows self-point
    np.testing.assert_array_equal(
        np.asarray(a.neigh)[n_real:],
        np.tile(np.arange(n_real, a.n_pad)[:, None], (1, 5)),
    )


def test_native_batcher_overflow_errors(mutag):
    from graph_transformer_tpu.native.batcher import NativeBatchAssembler

    na = NativeBatchAssembler(mutag)
    with pytest.raises(ValueError, match="nodes"):
        na.assemble(np.arange(50), 4, n_pad=64, e_pad=10_000, seed=0)
    with pytest.raises(ValueError, match="edges"):
        na.assemble(np.arange(8), 4, n_pad=4096, e_pad=8, seed=0)
