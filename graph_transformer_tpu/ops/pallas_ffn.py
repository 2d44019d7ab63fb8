"""Fused FFN + residual + LayerNorm Pallas kernel (forward AND backward).

The hot op of the U2GNN encoder is the position-wise feed-forward:
``out = LN(x + drop(drop(relu(x@W1+b1))@W2+b2))`` over ``M = N_pad·(K+1)``
rows.  The model dims are tiny (D ≤ 128) but F is large (ff_hidden = 1024 in
every README config), so the XLA path is HBM-bound on the ``[M, F]`` hidden
activation: it is written after the first matmul, read by the second, saved
for backward, and read again — ~4 × M·F·4 bytes per layer.  These kernels
keep the hidden entirely in VMEM:

- forward: one pass per row tile, h never touches HBM;
- backward: recomputes h per tile (free — it lives in VMEM) and accumulates
  dW1/db1/dW2/db2/dγ/dβ across the sequential TPU grid, so backward traffic
  is also just x, g, dx and the (tiny) weights.

Dropout uses the on-core PRNG seeded per (seed, tile): forward and backward
regenerate bit-identical masks, so nothing is stored.

Numerics: inputs may be bf16; all compute is f32 in-kernel (MXU
``preferred_element_type``), matching the XLA reference path within bf16
rounding.  ``ffn_residual_ln_reference`` is the pure-jnp twin used for
correctness tests and as the non-TPU fallback.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable off-TPU; kernels then run in interpret mode
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False

DEFAULT_TILE = 512


def on_tpu() -> bool:
    """True when the default backend is a real TPU (Mosaic compiles);
    elsewhere kernels must run with ``interpret=True``."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _keep_threshold(rate: float) -> int:
    # uint32 threshold: keep iff bits < keep_prob * 2^32
    return min(int((1.0 - rate) * 4294967296.0), 4294967295)


def _dropout_mask(shape, rate: float):
    """In-kernel dropout keep-mask from the per-core PRNG (f32 0/1).

    ``prng_random_bits`` yields *signed* int32 on TPU; the comparison must be
    done in uint32 space or promotion folds it into a constant mask.
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    thresh = jnp.full(shape, _keep_threshold(rate), jnp.uint32)
    return (bits < thresh).astype(jnp.float32)


# ------------------------------------------------------------------- forward
def _fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                g_ref, beta_ref, out_ref, *, rate: float, eps: float):
    i = pl.program_id(0)
    # bf16 inputs: run the MXU in bf16 (2x throughput), accumulate f32
    mm = x_ref.dtype if x_ref.dtype == jnp.bfloat16 else jnp.float32
    x = x_ref[:].astype(jnp.float32)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + i)
    hpre = jnp.dot(x.astype(mm), w1_ref[:].astype(mm),
                   preferred_element_type=jnp.float32) + b1_ref[:].astype(jnp.float32)
    h = jnp.maximum(hpre, 0.0)
    keep = 1.0 - rate
    if rate > 0.0:
        h = h * _dropout_mask(h.shape, rate) / keep
    y = jnp.dot(h.astype(mm), w2_ref[:].astype(mm),
                preferred_element_type=jnp.float32) + b2_ref[:].astype(jnp.float32)
    if rate > 0.0:
        y = y * _dropout_mask(y.shape, rate) / keep
    u = x + y
    mu = jnp.mean(u, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(u - mu), axis=-1, keepdims=True)
    uhat = (u - mu) * jax.lax.rsqrt(var + eps)
    out = uhat * g_ref[:].astype(jnp.float32) + beta_ref[:].astype(jnp.float32)
    out_ref[:] = out.astype(out_ref.dtype)


# ------------------------------------------------------------------ backward
def _bwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                g_ref, beta_ref, dout_ref,
                dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dg_ref, dbeta_ref,
                *, rate: float, eps: float):
    i = pl.program_id(0)
    mm = x_ref.dtype if x_ref.dtype == jnp.bfloat16 else jnp.float32
    x = x_ref[:].astype(jnp.float32)
    w1 = w1_ref[:].astype(mm)
    w2 = w2_ref[:].astype(mm)
    gam = g_ref[:].astype(jnp.float32)
    dout = dout_ref[:].astype(jnp.float32)
    keep = 1.0 - rate

    # --- recompute forward (identical PRNG stream as _fwd_kernel)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + i)
    hpre = jnp.dot(x.astype(mm), w1, preferred_element_type=jnp.float32) + b1_ref[:].astype(jnp.float32)
    h0 = jnp.maximum(hpre, 0.0)
    if rate > 0.0:
        mask1 = _dropout_mask(h0.shape, rate)
        h = h0 * mask1 / keep
    else:
        h = h0
    y = jnp.dot(h.astype(mm), w2, preferred_element_type=jnp.float32) + b2_ref[:].astype(jnp.float32)
    if rate > 0.0:
        mask2 = _dropout_mask(y.shape, rate)
        y = y * mask2 / keep
    u = x + y
    mu = jnp.mean(u, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(u - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    uhat = (u - mu) * rstd

    # --- LayerNorm backward
    gg = dout * gam  # [T, D]
    du = (gg - jnp.mean(gg, axis=-1, keepdims=True)
          - uhat * jnp.mean(gg * uhat, axis=-1, keepdims=True)) * rstd
    dgamma = jnp.sum(dout * uhat, axis=0, keepdims=True)  # [1, D]
    dbeta = jnp.sum(dout, axis=0, keepdims=True)  # [1, D]

    # --- FFN backward (du flows to both residual x and y).
    # All contractions via dot_general with explicit dimension numbers — an
    # explicit ``.T`` would materialize a VMEM relayout of the [T, F] tiles.
    def _dotT_lhs(a, b):  # aᵀ @ b, contracting dim0/dim0
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    def _dotT_rhs(a, b):  # a @ bᵀ, contracting dim1/dim1
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    dy = du
    if rate > 0.0:
        dy = dy * mask2 / keep
    db2 = jnp.sum(dy, axis=0, keepdims=True)
    dw2 = _dotT_lhs(h.astype(mm), dy.astype(mm))  # [F, D]
    dh = _dotT_rhs(dy.astype(mm), w2)  # [T, F]
    if rate > 0.0:
        dh = dh * mask1 / keep
    dh = dh * (hpre > 0.0).astype(jnp.float32)
    db1 = jnp.sum(dh, axis=0, keepdims=True)
    dw1 = _dotT_lhs(x.astype(mm), dh.astype(mm))  # [D, F]
    dx = du + _dotT_rhs(dh.astype(mm), w1)  # [T, D]

    dx_ref[:] = dx.astype(dx_ref.dtype)
    # weight grads accumulate across the (sequential) grid
    @pl.when(i == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dg_ref[:] = jnp.zeros_like(dg_ref)
        dbeta_ref[:] = jnp.zeros_like(dbeta_ref)

    dw1_ref[:] += dw1
    db1_ref[:] += db1
    dw2_ref[:] += dw2
    db2_ref[:] += db2
    dg_ref[:] += dgamma
    dbeta_ref[:] += dbeta


# ---------------------------------------------------------------- dispatcher
def _pad_rows(x, tile):
    m = x.shape[0]
    m_pad = ((m + tile - 1) // tile) * tile
    if m_pad == m:
        return x, m
    return jnp.pad(x, ((0, m_pad - m), (0, 0))), m


def _row_specs(tile, d, f):
    """(in_specs for x, w1, b1, w2, b2, gamma, beta).

    1-D params (biases, LN scale/shift) travel as (1, n) 2-D arrays: a 1-D
    block batches to (Squeezed, n) under vmap, which the Mosaic layout check
    rejects; (1, n) blocks batch cleanly (see _seed_arr)."""
    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    return [
        pl.BlockSpec((tile, d), lambda i: (i, 0)),
        full(d, f),
        full(1, f),
        full(f, d),
        full(1, d),
        full(1, d),
        full(1, d),
    ]


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(8, 9, 10)
)
def ffn_residual_ln(x, w1, b1, w2, b2, gamma, beta, seed=None,
                    rate: float = 0.0,
                    tile: int = DEFAULT_TILE, interpret: bool = False):
    """``LN(x + drop(drop(relu(x@w1+b1))@w2+b2))`` over 2-D ``x [M, D]``.

    ``seed``: int32 array ``[1]`` feeding the in-kernel dropout PRNG (may be
    traced — vary it per step without recompiling).  ``None`` ⇒ 0.
    """
    return _fwd_call(x, w1, b1, w2, b2, gamma, beta, seed, rate, tile,
                     interpret)


def _seed_arr(seed):
    """Seed as a regular (1, 1) int32 VMEM input.

    NOT scalar-prefetch: a batched scalar-prefetch operand sends the whole
    pallas_call down jax's sequential ``_batch_with_explicit_loop`` fallback,
    which would serialize the fold-vmapped CV runners.  A plain (1, 1) input
    batches natively (the vmap axis becomes a leading grid dimension;
    ``pl.program_id`` keeps indexing the *user* grid — vmapped dims are
    excluded from the kernel-visible grid indices)."""
    if seed is None:
        return jnp.zeros((1, 1), jnp.int32)
    return jnp.asarray(seed, jnp.int32).reshape((1, 1))


_SEED_SPEC = pl.BlockSpec((1, 1), lambda i: (0, 0))


def _r2(v):
    """1-D param -> (1, n) (see _row_specs)."""
    return v.reshape(1, -1)


def _fwd_call(x, w1, b1, w2, b2, gamma, beta, seed, rate, tile, interpret):
    d, f = w1.shape
    xp, m = _pad_rows(x, tile)
    grid = (xp.shape[0] // tile,)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate, eps=1e-5),
        grid=grid,
        in_specs=[_SEED_SPEC] + _row_specs(tile, d, f),
        out_specs=pl.BlockSpec((tile, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        interpret=interpret,
    )(_seed_arr(seed), xp, w1, _r2(b1), w2, _r2(b2), _r2(gamma), _r2(beta))
    return out[:m]


def _fwd_rule(x, w1, b1, w2, b2, gamma, beta, seed, rate, tile, interpret):
    out = _fwd_call(x, w1, b1, w2, b2, gamma, beta, seed, rate, tile, interpret)
    return out, (x, w1, b1, w2, b2, gamma, beta, seed)


def _bwd_rule(rate, tile, interpret, res, dout):
    x, w1, b1, w2, b2, gamma, beta, seed = res
    d, f = w1.shape
    xp, m = _pad_rows(x, tile)
    gp, _ = _pad_rows(dout.astype(x.dtype), tile)
    grid = (xp.shape[0] // tile,)
    full_out = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    f32 = jnp.float32
    dx, dw1, db1, dw2, db2, dg, dbeta = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate, eps=1e-5),
        grid=grid,
        in_specs=[_SEED_SPEC] + _row_specs(tile, d, f)
        + [pl.BlockSpec((tile, d), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((tile, d), lambda i: (i, 0)),
            full_out(d, f),
            full_out(1, f),
            full_out(f, d),
            full_out(1, d),
            full_out(1, d),
            full_out(1, d),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(xp.shape, x.dtype),
            jax.ShapeDtypeStruct((d, f), f32),
            jax.ShapeDtypeStruct((1, f), f32),
            jax.ShapeDtypeStruct((f, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
            jax.ShapeDtypeStruct((1, d), f32),
        ],
        interpret=interpret,
    )(_seed_arr(seed), xp, w1, _r2(b1), w2, _r2(b2), _r2(gamma), _r2(beta), gp)
    import numpy as _np

    seed_ct = (
        None
        if seed is None
        else _np.zeros(_np.shape(seed), jax.dtypes.float0)
    )
    return (
        dx[:m],
        dw1.astype(w1.dtype),
        db1.reshape(b1.shape).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(b2.shape).astype(b2.dtype),
        dg.reshape(gamma.shape).astype(gamma.dtype),
        dbeta.reshape(beta.shape).astype(beta.dtype),
        seed_ct,
    )


ffn_residual_ln.defvjp(_fwd_rule, _bwd_rule)


# ------------------------------------------------------------------ reference
def ffn_residual_ln_reference(x, w1, b1, w2, b2, gamma, beta,
                              rate: float = 0.0, dropout_rngs=None,
                              eps: float = 1e-5):
    """Pure-jnp twin (deterministic when rate == 0); the XLA fallback path."""
    xf = x.astype(jnp.float32)
    h = jnp.maximum(xf @ w1.astype(jnp.float32) + b1, 0.0)
    keep = 1.0 - rate
    if rate > 0.0 and dropout_rngs is not None:
        k1, k2 = dropout_rngs
        h = h * jax.random.bernoulli(k1, keep, h.shape) / keep
    y = h @ w2.astype(jnp.float32) + b2
    if rate > 0.0 and dropout_rngs is not None:
        y = y * jax.random.bernoulli(k2, keep, y.shape) / keep
    u = xf + y
    mu = jnp.mean(u, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(u - mu), axis=-1, keepdims=True)
    return (((u - mu) * jax.lax.rsqrt(var + eps)) * gamma + beta).astype(x.dtype)
