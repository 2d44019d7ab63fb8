"""Fully-fused encoder-layer Pallas kernel (attention + FFN, fwd AND bwd).

The U2GNN aggregator runs a transformer encoder layer over tiny sampled
neighborhoods: ``[N_pad, S, D]`` with S = K+1 ∈ {5, 9, 17} and D = the node
feature dim (4 on REDDIT).  At these shapes the XLA path is dominated not by
FLOPs but by materializing and re-laying-out a dozen small intermediates per
layer (qkv, per-head transposes, [N,1,S,S] scores, ctx, attn_out, LN stats);
profiling on a v5e (scripts/profile_step.py) shows the attention+glue costs
~5× the already-fused FFN kernel.

This kernel computes the ENTIRE torch-semantics encoder layer
(``pytorch_U2GNN_Sup.py:20-21``: attn → +residual → LN1 → FFN → +residual →
LN2) for a tile of whole neighborhoods in one pass, all intermediates in
VMEM:

- rows are node-major: row r of ``x2d [N·S, D]`` is slot ``r % S`` of node
  ``r // S``; a tile holds G = R/S whole neighborhoods;
- per-neighborhood attention becomes ONE dense ``[R, R]`` masked matmul pair
  per tile with a block-diagonal mask (``row_i//S == row_j//S``).  The
  off-block FLOPs are waste, but at S ≤ 17 and D ≤ 128 the scores/ctx
  matmuls are a fraction of the FFN matmuls — and the dense form keeps the
  MXU busy instead of shuffling [N,1,S,hd] layouts through the VPU;
- backward recomputes the forward from the tile inputs (everything already
  in VMEM) and accumulates all weight grads across the sequential grid;
- dropout masks regenerate from the on-core PRNG with the same
  (seed, tile) stream in fwd and bwd — nothing is stored.

Single-head only (the reference uses nhead=1 everywhere); callers fall back
to the XLA path for multi-head or masked (node-axis) attention.
``fused_encoder_layer_reference`` is the pure-jnp twin for tests/fallback.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu imports off-TPU; kernels then run with interpret=True
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False

from graph_transformer_tpu.ops.pallas_ffn import (
    _dropout_mask,
    _pad_rows,
    _r2,
    _seed_arr,
    on_tpu,
)


# Banded [R, BW] softmax/dropout layout (scripts/bench_banded.py A/B).
# MEASURED SLOWER on v5e at bench shapes (T=4 fwd 3.51 vs 3.09 ms, fwd+bwd
# 10.28 vs 9.28): the band extract/expand selection matmuls + the extra
# [R, R] mask passes cost more than the dense form's softmax+PRNG they
# replace, in both f32 and compute-dtype variants.  Kept off as a recorded
# dead end (BASELINE.md round-3 notes) so later rounds don't re-walk it.
BANDED = False


def tile_rows(seq_len: int, target: int = 512) -> int:
    """Smallest multiple of lcm(8, S) ≥ ~target rows (sublane alignment and
    whole neighborhoods per tile)."""
    base = (8 * seq_len) // math.gcd(8, seq_len)
    return base * max(1, target // base)


def _block_mask(R: int, S: int):
    """[R, R] bool: True where rows belong to the same neighborhood."""
    row = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0) // S
    col = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) // S
    return row == col


def _band_width(S: int) -> int:
    return ((S + 7) // 8) * 8


def _band_select(R: int, S: int, BW: int):
    """[R, BW] 0/1 f32 selection matrix: sel[c, j] = 1 iff c % S == j.

    Used on the MXU in both directions of the banded-attention layout:
    ``band = (scores ⊙ bmask) @ sel`` extracts each row's own-neighborhood
    scores into column j = c % S (off-block entries contribute exact zeros),
    and ``dense = (band @ selᵀ) ⊙ bmask`` scatters them back.  Softmax and
    attention-dropout then run on [R, BW] (BW = S rounded up to a sublane
    multiple, ≤ 32) instead of the 57×-sparse [R, R] block-diagonal form —
    the round-3 profile showed those VPU passes (exp/max/sum + PRNG mask
    regeneration, 4 vregs per 8 rows at R=504) dominating the attention
    block's cost at D=4."""
    c = jax.lax.broadcasted_iota(jnp.int32, (R, BW), 0) % S
    j = jax.lax.broadcasted_iota(jnp.int32, (R, BW), 1)
    return (c == j).astype(jnp.float32)


def _dotT_lhs(a, b):  # aᵀ @ b (contract dim0/dim0)
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dotT_rhs(a, b):  # a @ bᵀ (contract dim1/dim1)
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _ln(u, g, b, eps=1e-5):
    mu = jnp.mean(u, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(u - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    uhat = (u - mu) * rstd
    return uhat * g + b, uhat, rstd


def _ln_bwd(dout, uhat, rstd, g):
    gg = dout * g
    du = (gg - jnp.mean(gg, axis=-1, keepdims=True)
          - uhat * jnp.mean(gg * uhat, axis=-1, keepdims=True)) * rstd
    return (du, jnp.sum(dout * uhat, axis=0, keepdims=True),
            jnp.sum(dout, axis=0, keepdims=True))


def _forward_tile(x, w_in, b_in, w_out, b_out, ln1g, ln1b,
                  w1, b1, w2, b2, ln2g, ln2b, *, S, rate, want_residuals):
    """Shared fwd math over one [R, D] tile (f32 in, f32 out).  Dropout draws
    (if rate>0) happen in a fixed order so bwd regenerates the same masks."""
    R, D = x.shape
    mm = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    keep = 1.0 - rate

    qkv = jnp.dot(x.astype(mm), w_in.astype(mm),
                  preferred_element_type=jnp.float32) + b_in
    q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]
    scores = _dotT_rhs(q.astype(mm), k.astype(mm)) / math.sqrt(D)
    banded = BANDED and S <= 32
    if banded:
        # Banded layout: softmax + dropout on [R, BW], dense only for the
        # MXU matmuls (see _band_select).  Same set of score entries as the
        # dense form (selection matmuls run in the compute dtype, so the
        # bf16 path rounds scores/attn once more than the dense form).
        BW = _band_width(S)
        bmaskf = _block_mask(R, S).astype(mm)
        sel = _band_select(R, S, BW).astype(mm)
        band = jnp.dot(scores.astype(mm) * bmaskf, sel,
                       preferred_element_type=jnp.float32)
        jcol = jax.lax.broadcasted_iota(jnp.int32, (R, BW), 1)
        band = jnp.where(jcol < S, band, -1e30)
        attn = jax.nn.softmax(band, axis=-1)           # [R, BW] f32
        m_attn = _dropout_mask(attn.shape, rate) if rate > 0.0 else None
        band_d = attn * m_attn / keep if rate > 0.0 else attn
        attn_d = (_dotT_rhs(band_d.astype(mm), sel).astype(mm)
                  * bmaskf)                            # [R, R] mm-typed
    else:
        bmaskf = sel = None
        scores = jnp.where(_block_mask(R, S), scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1)
        m_attn = _dropout_mask(attn.shape, rate) if rate > 0.0 else None
        attn_d = attn * m_attn / keep if rate > 0.0 else attn
    ctx = jnp.dot(attn_d.astype(mm), v.astype(mm),
                  preferred_element_type=jnp.float32)
    a = jnp.dot(ctx.astype(mm), w_out.astype(mm),
                preferred_element_type=jnp.float32) + b_out
    m_a = _dropout_mask(a.shape, rate) if rate > 0.0 else None
    if rate > 0.0:
        a = a * m_a / keep
    y1, uhat1, rstd1 = _ln(x + a, ln1g, ln1b)

    hpre = jnp.dot(y1.astype(mm), w1.astype(mm),
                   preferred_element_type=jnp.float32) + b1
    h = jnp.maximum(hpre, 0.0)
    m_h = _dropout_mask(h.shape, rate) if rate > 0.0 else None
    if rate > 0.0:
        h = h * m_h / keep
    z = jnp.dot(h.astype(mm), w2.astype(mm),
                preferred_element_type=jnp.float32) + b2
    m_z = _dropout_mask(z.shape, rate) if rate > 0.0 else None
    if rate > 0.0:
        z = z * m_z / keep
    out, uhat2, rstd2 = _ln(y1 + z, ln2g, ln2b)
    if not want_residuals:
        return out
    return out, dict(q=q, k=k, v=v, attn=attn, attn_d=attn_d, ctx=ctx,
                     m_attn=m_attn, m_a=m_a, m_h=m_h, m_z=m_z,
                     bmaskf=bmaskf, sel=sel,
                     uhat1=uhat1, rstd1=rstd1, y1=y1, hpre=hpre, h=h,
                     uhat2=uhat2, rstd2=rstd2)


def _fwd_kernel(seed_ref, x_ref, w_in_ref, b_in_ref, w_out_ref, b_out_ref,
                ln1g_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                ln2g_ref, ln2b_ref, out_ref, *, S, rate):
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + pl.program_id(0))
    out = _forward_tile(
        x_ref[:].astype(jnp.float32),
        w_in_ref[:], b_in_ref[:].astype(jnp.float32),
        w_out_ref[:], b_out_ref[:].astype(jnp.float32),
        ln1g_ref[:].astype(jnp.float32), ln1b_ref[:].astype(jnp.float32),
        w1_ref[:], b1_ref[:].astype(jnp.float32),
        w2_ref[:], b2_ref[:].astype(jnp.float32),
        ln2g_ref[:].astype(jnp.float32), ln2b_ref[:].astype(jnp.float32),
        S=S, rate=rate, want_residuals=False,
    )
    out_ref[:] = out.astype(out_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, w_in_ref, b_in_ref, w_out_ref, b_out_ref,
                ln1g_ref, ln1b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                ln2g_ref, ln2b_ref, dout_ref,
                dx_ref, dw_in_ref, db_in_ref, dw_out_ref, db_out_ref,
                dln1g_ref, dln1b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                dln2g_ref, dln2b_ref, *, S, rate):
    i = pl.program_id(0)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + i)
    x = x_ref[:].astype(jnp.float32)
    mm = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    keep = 1.0 - rate
    R, D = x.shape

    w_in = w_in_ref[:]
    w_out = w_out_ref[:]
    w1 = w1_ref[:]
    w2 = w2_ref[:]
    _, r = _forward_tile(
        x, w_in, b_in_ref[:].astype(jnp.float32),
        w_out, b_out_ref[:].astype(jnp.float32),
        ln1g_ref[:].astype(jnp.float32), ln1b_ref[:].astype(jnp.float32),
        w1, b1_ref[:].astype(jnp.float32),
        w2, b2_ref[:].astype(jnp.float32),
        ln2g_ref[:].astype(jnp.float32), ln2b_ref[:].astype(jnp.float32),
        S=S, rate=rate, want_residuals=True,
    )
    dout = dout_ref[:].astype(jnp.float32)

    # LN2 → FFN
    du2, dln2g, dln2b = _ln_bwd(dout, r["uhat2"], r["rstd2"],
                                ln2g_ref[:].astype(jnp.float32))
    dz = du2 * r["m_z"] / keep if rate > 0.0 else du2
    db2 = jnp.sum(dz, axis=0, keepdims=True)
    dw2 = _dotT_lhs(r["h"].astype(mm), dz.astype(mm))
    dh = _dotT_rhs(dz.astype(mm), w2.astype(mm))
    if rate > 0.0:
        dh = dh * r["m_h"] / keep
    dh = dh * (r["hpre"] > 0.0).astype(jnp.float32)
    db1 = jnp.sum(dh, axis=0, keepdims=True)
    dw1 = _dotT_lhs(r["y1"].astype(mm), dh.astype(mm))
    dy1 = du2 + _dotT_rhs(dh.astype(mm), w1.astype(mm))

    # LN1 → attention
    du1, dln1g, dln1b = _ln_bwd(dy1, r["uhat1"], r["rstd1"],
                                ln1g_ref[:].astype(jnp.float32))
    da = du1 * r["m_a"] / keep if rate > 0.0 else du1
    db_out = jnp.sum(da, axis=0, keepdims=True)
    dw_out = _dotT_lhs(r["ctx"].astype(mm), da.astype(mm))
    dctx = _dotT_rhs(da.astype(mm), w_out.astype(mm))
    dattn_d = _dotT_rhs(dctx.astype(mm), r["v"].astype(mm))  # [R, R]
    dv = _dotT_lhs(r["attn_d"].astype(mm), dctx.astype(mm))  # [R, D]
    if r["sel"] is not None:
        # Banded: pull the dense grad into the [R, BW] band, run
        # dropout/softmax backward there, scatter the result back.
        dband_d = jnp.dot(dattn_d.astype(mm) * r["bmaskf"], r["sel"],
                          preferred_element_type=jnp.float32)
        dband = dband_d * r["m_attn"] / keep if rate > 0.0 else dband_d
        ds_band = r["attn"] * (dband - jnp.sum(dband * r["attn"], axis=-1,
                                               keepdims=True))
        ds_band = ds_band / math.sqrt(D)
        ds = (_dotT_rhs(ds_band.astype(mm), r["sel"]).astype(mm)
              * r["bmaskf"])
    else:
        dattn = dattn_d * r["m_attn"] / keep if rate > 0.0 else dattn_d
        # softmax backward (rows); off-block entries have attn == 0 → no grad
        ds = r["attn"] * (dattn - jnp.sum(dattn * r["attn"], axis=-1,
                                          keepdims=True))
        ds = ds / math.sqrt(D)
    dq = jnp.dot(ds.astype(mm), r["k"].astype(mm),
                 preferred_element_type=jnp.float32)
    dk = _dotT_lhs(ds.astype(mm), r["q"].astype(mm))
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)  # [R, 3D]
    db_in = jnp.sum(dqkv, axis=0, keepdims=True)
    dw_in = _dotT_lhs(x.astype(mm), dqkv.astype(mm))
    dx = du1 + _dotT_rhs(dqkv.astype(mm), w_in.astype(mm))

    dx_ref[:] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        for ref in (dw_in_ref, db_in_ref, dw_out_ref, db_out_ref,
                    dln1g_ref, dln1b_ref, dw1_ref, db1_ref, dw2_ref,
                    db2_ref, dln2g_ref, dln2b_ref):
            ref[:] = jnp.zeros_like(ref)

    dw_in_ref[:] += dw_in
    db_in_ref[:] += db_in
    dw_out_ref[:] += dw_out
    db_out_ref[:] += db_out
    dln1g_ref[:] += dln1g
    dln1b_ref[:] += dln1b
    dw1_ref[:] += dw1
    db1_ref[:] += db1
    dw2_ref[:] += dw2
    db2_ref[:] += db2
    dln2g_ref[:] += dln2g
    dln2b_ref[:] += dln2b


# ---------------------------------------------------------------- dispatcher
_SEED_SPEC = pl.BlockSpec((1, 1), lambda i: (0, 0))


def _in_specs(R, D, F):
    # 1-D params travel as (1, n): 1-D blocks batch to (Squeezed, n) under
    # vmap, which the Mosaic layout check rejects (see pallas_ffn._row_specs)
    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    return [
        _SEED_SPEC,                                  # seed (1,1) — see _seed_arr
        pl.BlockSpec((R, D), lambda i: (i, 0)),      # x
        full(D, 3 * D), full(1, 3 * D),              # w_in, b_in
        full(D, D), full(1, D),                      # w_out, b_out
        full(1, D), full(1, D),                      # ln1 γ β
        full(D, F), full(1, F),                      # w1, b1
        full(F, D), full(1, D),                      # w2, b2
        full(1, D), full(1, D),                      # ln2 γ β
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17))
def fused_encoder_layer(x2d, w_in, b_in, w_out, b_out, ln1g, ln1b,
                        w1, b1, w2, b2, ln2g, ln2b, seed,
                        seq_len: int, rate: float = 0.0,
                        tile_target: int = 512, interpret: bool = False):
    """One torch-semantics encoder layer over node-major ``x2d [N·S, D]``
    (S = ``seq_len``).  Attention is confined to each node's S rows.

    ``seed``: int32 [1] for in-kernel dropout (traced; ``None`` ⇒ 0).
    """
    return _fwd_call(x2d, w_in, b_in, w_out, b_out, ln1g, ln1b,
                     w1, b1, w2, b2, ln2g, ln2b, seed,
                     seq_len, rate, tile_target, interpret)


def _fwd_call(x2d, w_in, b_in, w_out, b_out, ln1g, ln1b, w1, b1, w2, b2,
              ln2g, ln2b, seed, seq_len, rate, tile_target, interpret):
    D, F = w1.shape
    R = tile_rows(seq_len, tile_target)
    xp, m = _pad_rows(x2d, R)
    grid = (xp.shape[0] // R,)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, S=seq_len, rate=rate),
        grid=grid,
        in_specs=_in_specs(R, D, F),
        out_specs=pl.BlockSpec((R, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(xp.shape, x2d.dtype),
        interpret=interpret,
    )(_seed_arr(seed), xp, w_in, _r2(b_in), w_out, _r2(b_out),
      _r2(ln1g), _r2(ln1b), w1, _r2(b1), w2, _r2(b2), _r2(ln2g), _r2(ln2b))
    return out[:m]


def _fwd_rule(x2d, w_in, b_in, w_out, b_out, ln1g, ln1b, w1, b1, w2, b2,
              ln2g, ln2b, seed, seq_len, rate, tile_target, interpret):
    out = _fwd_call(x2d, w_in, b_in, w_out, b_out, ln1g, ln1b, w1, b1,
                    w2, b2, ln2g, ln2b, seed, seq_len, rate, tile_target,
                    interpret)
    return out, (x2d, w_in, b_in, w_out, b_out, ln1g, ln1b, w1, b1, w2, b2,
                 ln2g, ln2b, seed)


def _bwd_rule(seq_len, rate, tile_target, interpret, res, dout):
    (x2d, w_in, b_in, w_out, b_out, ln1g, ln1b, w1, b1, w2, b2,
     ln2g, ln2b, seed) = res
    D, F = w1.shape
    R = tile_rows(seq_len, tile_target)
    xp, m = _pad_rows(x2d, R)
    gp, _ = _pad_rows(dout.astype(x2d.dtype), R)
    grid = (xp.shape[0] // R,)
    full_out = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, S=seq_len, rate=rate),
        grid=grid,
        in_specs=_in_specs(R, D, F)
        + [pl.BlockSpec((R, D), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((R, D), lambda i: (i, 0)),
            full_out(D, 3 * D), full_out(1, 3 * D),
            full_out(D, D), full_out(1, D),
            full_out(1, D), full_out(1, D),
            full_out(D, F), full_out(1, F),
            full_out(F, D), full_out(1, D),
            full_out(1, D), full_out(1, D),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(xp.shape, x2d.dtype),
            jax.ShapeDtypeStruct((D, 3 * D), f32),
            jax.ShapeDtypeStruct((1, 3 * D), f32),
            jax.ShapeDtypeStruct((D, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((D, F), f32),
            jax.ShapeDtypeStruct((1, F), f32),
            jax.ShapeDtypeStruct((F, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
            jax.ShapeDtypeStruct((1, D), f32),
        ],
        interpret=interpret,
    )(_seed_arr(seed), xp, w_in, _r2(b_in), w_out, _r2(b_out),
      _r2(ln1g), _r2(ln1b), w1, _r2(b1), w2, _r2(b2), _r2(ln2g), _r2(ln2b),
      gp)
    (dx, dw_in, db_in, dw_out, db_out, dln1g, dln1b,
     dw1, db1, dw2, db2, dln2g, dln2b) = outs
    import numpy as _np

    seed_ct = (
        None if seed is None
        else _np.zeros(_np.shape(seed), jax.dtypes.float0)
    )
    return (
        dx[:m],
        dw_in.astype(w_in.dtype),
        db_in.reshape(b_in.shape).astype(b_in.dtype),
        dw_out.astype(w_out.dtype),
        db_out.reshape(b_out.shape).astype(b_out.dtype),
        dln1g.reshape(ln1g.shape).astype(ln1g.dtype),
        dln1b.reshape(ln1b.shape).astype(ln1b.dtype),
        dw1.astype(w1.dtype),
        db1.reshape(b1.shape).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(b2.shape).astype(b2.dtype),
        dln2g.reshape(ln2g.shape).astype(ln2g.dtype),
        dln2b.reshape(ln2b.shape).astype(ln2b.dtype),
        seed_ct,
    )


fused_encoder_layer.defvjp(_fwd_rule, _bwd_rule)


# ----------------------------------------------------------------- reference
def fused_encoder_layer_reference(x3d, p, eps: float = 1e-5):
    """Deterministic pure-jnp twin over ``[B, S, D]`` with the same param
    dict layout as ``ops.attention._encoder_layer`` (rate 0)."""
    B, S, D = x3d.shape
    xf = x3d.astype(jnp.float32)
    qkv = xf @ p["w_in"] + p["b_in"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    scores = jnp.einsum("bsd,btd->bst", q, k) / math.sqrt(D)
    attn = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bst,btd->bsd", attn, v)
    a = ctx @ p["w_out"] + p["b_out"]
    u1 = xf + a
    mu = jnp.mean(u1, -1, keepdims=True)
    var = jnp.mean(jnp.square(u1 - mu), -1, keepdims=True)
    y1 = (u1 - mu) * jax.lax.rsqrt(var + eps) * p["ln1_scale"] + p["ln1_bias"]
    h = jnp.maximum(y1 @ p["w_ff1"] + p["b_ff1"], 0.0)
    z = h @ p["w_ff2"] + p["b_ff2"]
    u2 = y1 + z
    mu2 = jnp.mean(u2, -1, keepdims=True)
    var2 = jnp.mean(jnp.square(u2 - mu2), -1, keepdims=True)
    out = (u2 - mu2) * jax.lax.rsqrt(var2 + eps) * p["ln2_scale"] + p["ln2_bias"]
    return out.astype(x3d.dtype)
