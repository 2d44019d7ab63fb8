"""Fused encoder-layer kernel vs the XLA path (interpret mode on CPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graph_transformer_tpu.ops.attention import (
    _encoder_layer,
    init_encoder_params,
    transformer_encoder,
)
from graph_transformer_tpu.ops.pallas_encoder import (
    fused_encoder_layer,
    fused_encoder_layer_reference,
    tile_rows,
)


def _params(key, D, F):
    p = init_encoder_params(key, 1, D, F)
    return {k: v[0] for k, v in dataclasses.asdict(p).items()}


def _args(p):
    return (p["w_in"], p["b_in"], p["w_out"], p["b_out"],
            p["ln1_scale"], p["ln1_bias"],
            p["w_ff1"], p["b_ff1"], p["w_ff2"], p["b_ff2"],
            p["ln2_scale"], p["ln2_bias"])


def test_tile_rows_alignment():
    for S in (5, 9, 17, 2):
        R = tile_rows(S)
        assert R % 8 == 0 and R % S == 0 and R >= 256


@pytest.mark.parametrize("banded", [False, True])
@pytest.mark.parametrize("S,D,F,B", [(9, 4, 32, 57), (5, 8, 16, 13)])
def test_fused_forward_matches_xla(S, D, F, B, banded):
    from graph_transformer_tpu.ops import pallas_encoder

    p = _params(jax.random.key(0), D, F)
    x = jax.random.normal(jax.random.key(1), (B, S, D), jnp.float32)
    ref = _encoder_layer(x, p, num_heads=1, dropout_rate=0.0, rng=None)
    old = pallas_encoder.BANDED
    try:
        pallas_encoder.BANDED = banded
        got2d = fused_encoder_layer(
            x.reshape(B * S, D), *_args(p), None, S, 0.0, 128, True
        )
    finally:
        pallas_encoder.BANDED = old
    got = got2d.reshape(B, S, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # pure-jnp twin agrees too
    tw = fused_encoder_layer_reference(x, p)
    np.testing.assert_allclose(np.asarray(tw), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_backward_matches_xla_banded():
    from graph_transformer_tpu.ops import pallas_encoder

    S, D, F, B = 9, 4, 24, 23
    p = _params(jax.random.key(0), D, F)
    x = jax.random.normal(jax.random.key(1), (B, S, D), jnp.float32)

    def loss_ref(pp):
        return jnp.sum(_encoder_layer(x, pp, 1, 0.0, None) ** 2)

    def loss_fused(pp):
        out = fused_encoder_layer(
            x.reshape(B * S, D), *_args(pp), None, S, 0.0, 128, True
        )
        return jnp.sum(out ** 2)

    gr_p = jax.grad(loss_ref)(p)
    old = pallas_encoder.BANDED
    try:
        pallas_encoder.BANDED = True
        gf_p = jax.grad(loss_fused)(p)
    finally:
        pallas_encoder.BANDED = old
    for k in gr_p:
        np.testing.assert_allclose(
            np.asarray(gf_p[k]), np.asarray(gr_p[k]),
            rtol=2e-4, atol=2e-4, err_msg=k,
        )


def test_fused_backward_matches_xla():
    S, D, F, B = 9, 4, 24, 23
    p = _params(jax.random.key(0), D, F)
    x = jax.random.normal(jax.random.key(1), (B, S, D), jnp.float32)

    def loss_ref(pp, xx):
        return jnp.sum(_encoder_layer(xx, pp, 1, 0.0, None) ** 2)

    def loss_fused(pp, xx):
        out = fused_encoder_layer(
            xx.reshape(B * S, D), *_args(pp), None, S, 0.0, 128, True
        )
        return jnp.sum(out ** 2)

    gr_p, gr_x = jax.grad(loss_ref, argnums=(0, 1))(p, x)
    gf_p, gf_x = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gr_x),
                               rtol=2e-4, atol=2e-4)
    for k in gr_p:
        np.testing.assert_allclose(
            np.asarray(gf_p[k]), np.asarray(gr_p[k]),
            rtol=2e-4, atol=2e-4, err_msg=k,
        )


def test_transformer_encoder_use_pallas_routes_to_fused():
    """use_pallas on CPU (deterministic) goes through the fused kernel and
    matches the XLA path across multiple timesteps."""
    B, S, D, F, T = 11, 5, 8, 16, 3
    enc = init_encoder_params(jax.random.key(0), T, D, F)
    x = jax.random.normal(jax.random.key(1), (B, S, D))
    ref = transformer_encoder(enc, x, dropout_rate=0.0, rng=None,
                              num_timesteps=T, use_pallas=False)
    got = transformer_encoder(enc, x, dropout_rate=0.0, rng=None,
                              num_timesteps=T, use_pallas=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)
