"""Fused sample+gather+encode kernel (ops/pallas_sampled_encoder).

The kernel needs the on-core TPU PRNG even at dropout 0 (the sampler), so
numeric tests are TPU-gated like the other PRNG paths; the host-side
helpers test everywhere.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_transformer_tpu.ops.pallas_ffn import on_tpu
from graph_transformer_tpu.ops.pallas_sampled_encoder import (
    build_tag_table,
    dataset_codebook,
    dataset_tags,
)


def test_dataset_tags_gate():
    onehot = np.eye(4, dtype=np.float32)[[0, 2, 1, 3, 3]]
    np.testing.assert_array_equal(dataset_tags(onehot), [0, 2, 1, 3, 3])
    assert dataset_tags(onehot * 0.5) is None  # not 0/1
    assert dataset_tags(onehot + onehot[:, ::-1]) is None  # not one-hot
    wide = np.eye(200, dtype=np.float32)[:5]
    assert dataset_tags(wide) is None  # > lane width


def test_dataset_codebook():
    # one-hot: codes are the identity rows
    onehot = np.eye(4, dtype=np.float32)[[0, 2, 1, 3, 3]]
    tags, codes = dataset_codebook(onehot)
    np.testing.assert_allclose(codes[tags], onehot)
    # the REDDIT x0.01 constant rule: one code
    const = np.full((100, 4), 0.01, np.float32)
    tags, codes = dataset_codebook(const)
    assert codes.shape == (1, 4) and (tags == 0).all()
    np.testing.assert_allclose(codes[tags], const)
    # genuinely continuous features (more distinct rows than the 128-row
    # codebook bound): not applicable
    cont = np.random.default_rng(0).standard_normal((200, 4)).astype(np.float32)
    assert dataset_codebook(cont) is None


def test_build_tag_table():
    tags = np.asarray([5, 6, 7], np.int32)
    table = np.asarray([[1, 2] * 64, [0, 0] * 64, [1, 1] * 64], np.int32)
    tt = build_tag_table(table, tags)
    np.testing.assert_array_equal(tt[0, :4], [6, 7, 6, 7])
    np.testing.assert_array_equal(tt[1, :2], [5, 5])


@pytest.mark.skipif(not on_tpu(), reason="sampler needs the TPU PRNG")
def test_sampled_encoder_matches_two_pass_deterministic():
    """With degree-1 neighbor tables the sampling is deterministic
    (idx = 0 always), so the fused kernel must reproduce the two-pass
    fused_u2gnn_encoder on the equivalent gathered one-hot input."""
    from graph_transformer_tpu.ops.pallas_sampled_encoder import (
        fused_u2gnn_encoder_sampled,
    )
    from graph_transformer_tpu.ops.pallas_u2gnn import fused_u2gnn_encoder

    rng = np.random.default_rng(0)
    n, S, D, F, T = 64, 5, 4, 32, 2
    tags = rng.integers(0, D, n).astype(np.int32)
    nbr = rng.integers(0, n, n).astype(np.int32)  # one neighbor per node
    tag_rows = jnp.asarray(np.tile(tags[nbr][:, None], (1, 128)))
    deg = jnp.ones((n, 1), jnp.int32)
    self_tag = jnp.asarray(tags[:, None])
    params = tuple(
        jnp.asarray(rng.standard_normal(s) * 0.3, jnp.float32)
        for s in [(T, D, 3 * D), (T, 3 * D), (T, D, D), (T, D), (T, D),
                  (T, D), (T, D, F), (T, F), (T, F, D), (T, D), (T, D),
                  (T, D)]
    )
    seed = jnp.asarray([11], jnp.int32)
    got = fused_u2gnn_encoder_sampled(
        tag_rows, deg, self_tag, jnp.eye(D, dtype=jnp.float32), params,
        seed, S, T, 0.0
    )
    # reference: gather the (deterministic) neighborhood one-hots by hand
    neigh_tags = np.concatenate(
        [tags[:, None], np.tile(tags[nbr][:, None], (1, S - 1))], axis=1
    )
    x = np.eye(D, dtype=np.float32)[neigh_tags.reshape(-1)]
    want = fused_u2gnn_encoder(
        jnp.asarray(x, jnp.bfloat16), params, None, S, T, 0.0
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.skipif(not on_tpu(), reason="sampler needs the TPU PRNG")
def test_sampled_encoder_grads_match_two_pass_deterministic():
    from graph_transformer_tpu.ops.pallas_sampled_encoder import (
        fused_u2gnn_encoder_sampled,
    )
    from graph_transformer_tpu.ops.pallas_u2gnn import fused_u2gnn_encoder

    rng = np.random.default_rng(1)
    n, S, D, F, T = 32, 3, 4, 16, 2
    tags = rng.integers(0, D, n).astype(np.int32)
    nbr = rng.integers(0, n, n).astype(np.int32)
    tag_rows = jnp.asarray(np.tile(tags[nbr][:, None], (1, 128)))
    deg = jnp.ones((n, 1), jnp.int32)
    self_tag = jnp.asarray(tags[:, None])
    params = tuple(
        jnp.asarray(rng.standard_normal(s) * 0.3, jnp.float32)
        for s in [(T, D, 3 * D), (T, 3 * D), (T, D, D), (T, D), (T, D),
                  (T, D), (T, D, F), (T, F), (T, F, D), (T, D), (T, D),
                  (T, D)]
    )
    w = jnp.asarray(rng.standard_normal((n, D)), jnp.float32)
    seed = jnp.asarray([5], jnp.int32)

    g_fused = jax.grad(lambda p: jnp.sum(
        fused_u2gnn_encoder_sampled(tag_rows, deg, self_tag,
                                    jnp.eye(D, dtype=jnp.float32), p, seed,
                                    S, T, 0.0) * w))(params)
    neigh_tags = np.concatenate(
        [tags[:, None], np.tile(tags[nbr][:, None], (1, S - 1))], axis=1
    )
    x = jnp.asarray(np.eye(D, dtype=np.float32)[neigh_tags.reshape(-1)],
                    jnp.bfloat16)
    g_two = jax.grad(lambda p: jnp.sum(
        fused_u2gnn_encoder(x, p, None, S, T, 0.0) * w))(params)
    for a, b in zip(g_fused, g_two):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-2, rtol=5e-2)


@pytest.mark.skipif(not on_tpu(), reason="sampler needs the TPU PRNG")
def test_sampled_stored_matches_sampled_hybrid():
    """The stored-residual variant must reproduce the sampled-hybrid
    kernel bit-exactly in the forward (same seed, same tiling => same
    PRNG streams) and to rematerialization precision in the grads."""
    from graph_transformer_tpu.ops.pallas_sampled_encoder import (
        fused_u2gnn_encoder_sampled,
    )
    from graph_transformer_tpu.ops.pallas_stored_bwd import (
        fused_u2gnn_encoder_sampled_stored,
    )

    rng = np.random.default_rng(3)
    n, S, D, F, T = 48, 5, 4, 32, 3
    nc = 16
    tag_rows = jnp.asarray(rng.integers(0, nc, (n, 128)), jnp.int32)
    deg = jnp.asarray(rng.integers(1, 100, (n, 1)), jnp.int32)
    self_tag = jnp.asarray(rng.integers(0, nc, (n, 1)), jnp.int32)
    codebook = jnp.asarray(
        rng.standard_normal((nc, D)).astype(np.float32))
    params = tuple(
        jnp.asarray(rng.standard_normal(s) * 0.3, jnp.float32)
        for s in [(T, D, 3 * D), (T, 3 * D), (T, D, D), (T, D), (T, D),
                  (T, D), (T, D, F), (T, F), (T, F, D), (T, D), (T, D),
                  (T, D)]
    )
    w = jnp.asarray(rng.standard_normal((n, D)), jnp.float32)
    seed = jnp.asarray([21], jnp.int32)
    tt = 128  # same tile for both (PRNG streams are per-tile)

    fa = fused_u2gnn_encoder_sampled(
        tag_rows, deg, self_tag, codebook, params, seed, S, T, 0.5, tt)
    fb = fused_u2gnn_encoder_sampled_stored(
        tag_rows, deg, self_tag, codebook, params, seed, S, T, 0.5, tt)
    np.testing.assert_array_equal(np.asarray(fa), np.asarray(fb))

    ga = jax.grad(lambda p: jnp.sum(fused_u2gnn_encoder_sampled(
        tag_rows, deg, self_tag, codebook, p, seed, S, T, 0.5, tt) * w)
    )(params)
    gb = jax.grad(lambda p: jnp.sum(fused_u2gnn_encoder_sampled_stored(
        tag_rows, deg, self_tag, codebook, p, seed, S, T, 0.5, tt) * w)
    )(params)
    va = jnp.concatenate([a.reshape(-1) for a in ga])
    vb = jnp.concatenate([b.reshape(-1) for b in gb])
    cos = float(jnp.vdot(va, vb)
                / (jnp.linalg.norm(va) * jnp.linalg.norm(vb)))
    assert cos > 0.999
