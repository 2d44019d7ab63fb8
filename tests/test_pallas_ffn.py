"""Pallas fused FFN kernel: interpret-mode correctness vs the jnp reference.

The dropout path needs the TPU hardware PRNG and is exercised on real
hardware by the bench; here the deterministic path (forward + full custom
backward) is validated in interpret mode.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_transformer_tpu.ops.attention import (
    init_encoder_params,
    transformer_encoder,
)
from graph_transformer_tpu.ops.pallas_ffn import (
    ffn_residual_ln,
    ffn_residual_ln_reference,
)


@pytest.fixture(scope="module")
def ffn_args():
    rng = np.random.RandomState(0)
    M, D, F = 70, 8, 32
    return tuple(
        jnp.asarray(a.astype(np.float32))
        for a in (
            rng.randn(M, D),
            rng.randn(D, F) * 0.1,
            rng.randn(F) * 0.1,
            rng.randn(F, D) * 0.1,
            rng.randn(D) * 0.1,
            np.ones(D) * 1.5,
            rng.randn(D) * 0.1,
        )
    )


def test_forward_matches_reference(ffn_args):
    out = ffn_residual_ln(*ffn_args, None, 0.0, 32, True)
    want = ffn_residual_ln_reference(*ffn_args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_forward_unaligned_rows(ffn_args):
    """M=70 with tile 32 exercises the row-padding path; padding rows are
    sliced off and real rows are unaffected."""
    out = ffn_residual_ln(*ffn_args, None, 0.0, 64, True)
    want = ffn_residual_ln_reference(*ffn_args)
    assert out.shape == want.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_backward_matches_reference(ffn_args):
    argnums = tuple(range(7))
    gp = jax.grad(
        lambda *a: jnp.sum(ffn_residual_ln(*a, None, 0.0, 32, True) ** 2),
        argnums=argnums,
    )(*ffn_args)
    gr = jax.grad(
        lambda *a: jnp.sum(ffn_residual_ln_reference(*a) ** 2),
        argnums=argnums,
    )(*ffn_args)
    for i, (a, b) in enumerate(zip(gp, gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-4,
            err_msg=f"grad argnum {i}",
        )


def test_encoder_pallas_path_matches_xla():
    """Full encoder with use_pallas (deterministic) == XLA encoder."""
    D, F, T = 8, 16, 2
    params = init_encoder_params(jax.random.key(0), T, D, F)
    x = jax.random.normal(jax.random.key(1), (10, 5, D))
    a = transformer_encoder(params, x, rng=None, use_pallas=False)
    # off-TPU the pallas path runs in interpret mode automatically
    import graph_transformer_tpu.ops.pallas_ffn as pf

    assert not pf.on_tpu()  # tests force the CPU backend
    b = transformer_encoder(params, x, rng=None, use_pallas=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_training_with_dropout_falls_back_off_tpu():
    """use_pallas + dropout off-TPU must still train (XLA fallback)."""
    D, F, T = 8, 16, 1
    params = init_encoder_params(jax.random.key(0), T, D, F)
    x = jax.random.normal(jax.random.key(1), (6, 3, D))
    out = transformer_encoder(
        params, x, dropout_rate=0.5, rng=jax.random.key(2), use_pallas=True
    )
    assert np.all(np.isfinite(np.asarray(out)))
