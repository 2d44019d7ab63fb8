"""Numerical tests of the sparse substrate and losses against dense numpy
references (and, where the reference defines the math, its exact formulas)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_transformer_tpu.ops.losses import (
    gae_loss,
    label_smoothing,
    soft_cross_entropy,
    supcon_loss,
)
from graph_transformer_tpu.ops.sparse import (
    edge_softmax,
    gcn_norm_edges,
    graph_sum_pool,
    sddmm_dot,
    spmm,
)


def _random_graph(rng, n=32, p=0.2):
    a = (rng.random((n, n)) < p).astype(np.float32)
    a = np.triu(a, 1)
    a = a + a.T
    src, dst = np.nonzero(a)
    return a, src.astype(np.int32), dst.astype(np.int32)


def test_graph_sum_pool(rng):
    x = rng.random((10, 4)).astype(np.float32)
    gid = np.array([0, 0, 0, 1, 1, 2, 2, 2, 3, 3], dtype=np.int32)
    out = np.asarray(graph_sum_pool(jnp.asarray(x), jnp.asarray(gid), 3))
    np.testing.assert_allclose(out[0], x[:3].sum(0), rtol=1e-6)
    np.testing.assert_allclose(out[2], x[5:8].sum(0), rtol=1e-6)
    # padding rows (gid == num_graphs) are dropped
    assert out.shape == (3, 4)


def test_spmm_matches_dense(rng):
    a, src, dst = _random_graph(rng)
    x = rng.random((32, 8)).astype(np.float32)
    val = rng.random(len(src)).astype(np.float32)
    dense = np.zeros((32, 32), np.float32)
    dense[src, dst] = val  # one entry per edge
    want = dense.T @ x  # y[dst] += val * x[src]
    got = np.asarray(
        spmm(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(val), jnp.asarray(x), 32)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_gcn_norm_matches_dense(rng):
    a, src, dst = _random_graph(rng)
    n = 32
    mask = np.ones(len(src), np.float32)
    s2, d2, val = gcn_norm_edges(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(mask), n
    )
    # dense D^-1/2 (A+I) D^-1/2
    ai = a + np.eye(n, dtype=np.float32)
    dinv = 1.0 / np.sqrt(ai.sum(1))
    want = dinv[:, None] * ai * dinv[None, :]
    got = np.zeros((n, n), np.float32)
    got[np.asarray(s2), np.asarray(d2)] = np.asarray(val)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_edge_softmax_matches_dense(rng):
    a, src, dst = _random_graph(rng)
    n = 32
    scores = rng.standard_normal(len(src)).astype(np.float32)
    mask = np.ones(len(src), np.float32)
    att = np.asarray(
        edge_softmax(jnp.asarray(scores), jnp.asarray(dst), jnp.asarray(mask), n)
    )
    # dense reference: softmax over incoming edges of each dst, -1e20 fill
    dense = np.full((n, n), -1e20, np.float64)
    dense[dst, src] = scores
    rows = np.exp(dense - dense.max(1, keepdims=True))
    rows = rows / rows.sum(1, keepdims=True)
    want = rows[dst, src]
    np.testing.assert_allclose(att, want, rtol=1e-4, atol=1e-6)
    # masked (padding) edges get zero attention and real rows still normalize
    sums = np.zeros(n)
    np.add.at(sums, dst, att)
    deg = np.bincount(dst, minlength=n)
    np.testing.assert_allclose(sums[deg > 0], 1.0, rtol=1e-5)


def test_sddmm_dot(rng):
    a, src, dst = _random_graph(rng)
    x = rng.random((32, 8)).astype(np.float32)
    y = rng.random((32, 8)).astype(np.float32)
    got = np.asarray(sddmm_dot(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(x), jnp.asarray(y)))
    want = np.sum(x[src] * y[dst], axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_label_smoothing_reference_formula():
    """pytorch_U2GNN_Sup.py:48-60: confidence 1-ε on true, ε/(C-1) off."""
    t = np.asarray(label_smoothing(jnp.asarray([1, 0]), 3, 0.1))
    np.testing.assert_allclose(t[0], [0.05, 0.9, 0.05], rtol=1e-6)
    np.testing.assert_allclose(t.sum(1), 1.0, rtol=1e-6)


def test_soft_cross_entropy_matches_numpy(rng):
    logits = rng.standard_normal((5, 3)).astype(np.float32)
    targets = rng.random((5, 3)).astype(np.float32)
    targets /= targets.sum(1, keepdims=True)
    lse = np.log(np.exp(logits).sum(1, keepdims=True))
    want = float(np.mean(-np.sum(targets * (logits - lse), axis=1)))
    got = float(soft_cross_entropy(jnp.asarray(logits), jnp.asarray(targets)))
    assert abs(got - want) < 1e-5


def test_supcon_loss_sanity(rng):
    """Embeddings aligned with the mask's groups score lower than random."""
    n, d = 16, 8
    labels = np.repeat(np.arange(4), 4)
    mask = (labels[:, None] == labels[None, :]).astype(np.float32)
    clustered = np.eye(4, d, dtype=np.float32)[labels] * 5
    clustered += 0.01 * rng.standard_normal((n, d)).astype(np.float32)
    scattered = rng.standard_normal((n, d)).astype(np.float32)
    l_good = float(supcon_loss(jnp.asarray(clustered), mask=jnp.asarray(mask)))
    l_bad = float(supcon_loss(jnp.asarray(scattered), mask=jnp.asarray(mask)))
    assert l_good < l_bad


def test_gae_loss_prefers_reconstruction(rng):
    n, d = 12, 6
    a = (rng.random((n, n)) < 0.3).astype(np.float32)
    a = np.maximum(a, a.T)
    # embedding whose ZZ^T approximates logit(a)
    good = jnp.asarray(10 * (a - 0.5) @ np.linalg.pinv(10 * (a - 0.5).T).astype(np.float32))
    good = jnp.asarray((a * 4 - 2) @ np.eye(n, d, dtype=np.float32))
    bad = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32) * 0.01)
    adj = jnp.asarray(a[:, :, None])
    l_bad = float(gae_loss([bad], adj, 1.0))
    # bad embeddings give sigmoid ~0.5 everywhere -> BCE ~log 2
    assert abs(l_bad - np.log(2)) < 0.05


def test_smaller_encoder_layer_semantics(rng):
    """Vestigial ``TransformerEncoderLayerSmaller`` (layers.py:96-176):
    linear(d->ff) -> relu -> 1-head self-attention in ff dims -> +bias; no
    layer norm, no residual.  Checked against a dense numpy recompute."""
    from graph_transformer_tpu.ops.attention import (
        init_smaller_encoder_layer,
        smaller_encoder_layer,
    )

    B, S, D, F = 3, 5, 4, 8
    key = jax.random.PRNGKey(0)
    p = init_smaller_encoder_layer(key, D, F)
    x = rng.standard_normal((B, S, D)).astype(np.float32)
    out = np.asarray(smaller_encoder_layer(p, jnp.asarray(x)))  # eval: no rng
    assert out.shape == (B, S, F)

    h = np.maximum(x @ np.asarray(p.w_lin) + np.asarray(p.b_lin), 0.0)
    qkv = h @ np.asarray(p.attn.w_in) + np.asarray(p.attn.b_in)
    q, k, v = np.split(qkv, 3, axis=-1)
    scores = q @ k.transpose(0, 2, 1) / np.sqrt(F)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    attn = e / e.sum(-1, keepdims=True)
    ctx = attn @ v
    want = ctx @ np.asarray(p.attn.w_out) + np.asarray(p.attn.b_out)
    want = want + np.asarray(p.bias)
    np.testing.assert_allclose(out, want, rtol=2e-5, atol=2e-5)


def test_smaller_encoder_layer_training_mode_attention_dropout(rng):
    """Training mode applies dropout both to the attention weights (the
    reference's nn.MultiheadAttention(dropout=dropout), layers.py:119) and
    to the output (layers.py:171): rate 0 under an rng must equal eval mode,
    and a positive rate must perturb more than output-dropout alone could
    (some positions survive output dropout yet still differ)."""
    from graph_transformer_tpu.ops.attention import (
        init_smaller_encoder_layer,
        smaller_encoder_layer,
    )

    B, S, D, F = 3, 5, 4, 8
    key = jax.random.PRNGKey(0)
    p = init_smaller_encoder_layer(key, D, F)
    x = jnp.asarray(rng.standard_normal((B, S, D)).astype(np.float32))
    ev = np.asarray(smaller_encoder_layer(p, x))
    drop_key = jax.random.PRNGKey(7)
    same = np.asarray(
        smaller_encoder_layer(p, x, dropout_rate=0.0, rng=drop_key)
    )
    np.testing.assert_allclose(same, ev, rtol=1e-6, atol=1e-6)

    tr = np.asarray(
        smaller_encoder_layer(p, x, dropout_rate=0.5, rng=drop_key)
    )
    # reconstruct what output-dropout-ONLY would produce with the same key
    # split; training output must differ from it because the attention
    # weights were also dropped before the value matmul
    from graph_transformer_tpu.ops.attention import _dropout

    _, k_out = jax.random.split(drop_key)
    bias = np.asarray(p.bias)
    out_only = np.asarray(
        _dropout(jnp.asarray(ev - bias), 0.5, k_out)
    ) + bias
    assert not np.allclose(tr, out_only)
