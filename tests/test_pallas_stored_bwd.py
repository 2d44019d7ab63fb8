"""Stored-residual backward (ops/pallas_stored_bwd) vs the recompute
(hybrid) path: forward bit-exact, grads to float precision, both dtypes
(interpret mode; the rate>0 PRNG paths are chip-gated like the other
kernels and validated by scripts/bench_stored_bwd.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_transformer_tpu.ops.pallas_stored_bwd import (
    fused_u2gnn_encoder_stored,
)
from graph_transformer_tpu.ops.pallas_u2gnn import fused_u2gnn_encoder

N, S, D, F, T = 36, 5, 4, 32, 3


def mk(dtype, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((N * S, D)), dtype)
    params = tuple(
        jnp.asarray(rng.standard_normal(s) * 0.3, jnp.float32)
        for s in [(T, D, 3 * D), (T, 3 * D), (T, D, D), (T, D), (T, D),
                  (T, D), (T, D, F), (T, F), (T, F, D), (T, D), (T, D),
                  (T, D)]
    )
    w = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)
    return x, params, w


def test_stored_bwd_matches_hybrid_f32():
    x, params, w = mk(jnp.float32)
    a = fused_u2gnn_encoder(x, params, None, S, T, 0.0, 128, True)
    b = fused_u2gnn_encoder_stored(x, params, None, S, T, 0.0, 128, True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ga = jax.grad(lambda p, xx: jnp.sum(
        fused_u2gnn_encoder(xx, p, None, S, T, 0.0, 128, True) * w),
        argnums=(0, 1))(params, x)
    gb = jax.grad(lambda p, xx: jnp.sum(
        fused_u2gnn_encoder_stored(xx, p, None, S, T, 0.0, 128, True) * w),
        argnums=(0, 1))(params, x)
    for u, v in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(u, np.float32),
                                   np.asarray(v, np.float32),
                                   rtol=1e-5, atol=1e-5)


def test_stored_bwd_bf16_at_least_as_faithful():
    """In bf16 the hybrid backward recomputes residuals from the
    bf16-ROUNDED saved layer inputs (rematerialization error); the stored
    path keeps the true forward values.  So the two differ — and the
    stored grads must be at least as close to the exact (f64-free f32
    reference) gradient as the hybrid's."""
    from graph_transformer_tpu.ops.pallas_u2gnn import (
        fused_u2gnn_encoder_reference,
    )

    x, params, w = mk(jnp.bfloat16)
    b = fused_u2gnn_encoder_stored(x, params, None, S, T, 0.0, 128, True)
    a = fused_u2gnn_encoder(x, params, None, S, T, 0.0, 128, True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(fn):
        return lambda p: jnp.sum(fn(p) * w)

    g_hyb = jax.grad(loss(lambda p: fused_u2gnn_encoder(
        x, p, None, S, T, 0.0, 128, True)))(params)
    g_sto = jax.grad(loss(lambda p: fused_u2gnn_encoder_stored(
        x, p, None, S, T, 0.0, 128, True)))(params)
    g_ref = jax.grad(loss(lambda p: fused_u2gnn_encoder_reference(
        x.reshape(N, S, D), p, T)))(params)

    def err(g):
        return sum(float(jnp.abs(u - v).sum())
                   for u, v in zip(g, g_ref))

    e_h, e_s = err(g_hyb), err(g_sto)
    assert e_s <= e_h * 1.05 + 1e-6, (e_s, e_h)


def test_stored_bwd_weight_tied():
    x, params, w = mk(jnp.float32, seed=3)
    tied = tuple(p[:1] for p in params)  # stored=1, replayed T times
    ga = jax.grad(lambda p: jnp.sum(
        fused_u2gnn_encoder(x, p, None, S, T, 0.0, 128, True) * w))(tied)
    gb = jax.grad(lambda p: jnp.sum(
        fused_u2gnn_encoder_stored(x, p, None, S, T, 0.0, 128, True) * w))(
        tied)
    for u, v in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   rtol=1e-5, atol=1e-5)
