"""Whole-encoder fused U2GNN Pallas kernel: all T timestep layers + slot-0
extraction in ONE forward and ONE backward pallas_call.

Motivation (round-3 profile, v5e, bench shapes R=79488 rows, D=4, F=1024,
S=9, T=4): the per-layer fused kernel (ops/pallas_encoder.py) costs
~0.8 ms/layer forward — re-launched 4x per U2GNN layer forward and 4x
backward, with every intermediate [R, D] bouncing through HBM and the
identical [R, R] block-mask/grid overhead re-paid per launch.  This kernel:

- runs the full T-layer torch-semantics encoder stack over each row tile
  with the tile resident in VMEM across layers (one launch fwd, one bwd);
- computes the LAST layer only for slot-0 rows — the U2GNN aggregation
  keeps only each neighborhood's self row (``pytorch_U2GNN_Sup.py:36``,
  ``split(dim=1)[0]``), so the final layer's FFN (the dominant matmul) runs
  on R/S rows and the kernel emits the pooled-ready ``[N, D]`` directly;
- supports weight-tied timestep replay (Universal-Transformer recurrence,
  ``universal_transformer_modified_utils.py:251-252``): pass ``stored < T``
  stacked layers and timestep t uses slice ``t % stored``;
- backward: the forward saves each layer's input rows (bf16, [T-1, R, D] —
  the only residuals cheap enough to store); backward re-derives each
  layer's internals from them in VMEM and accumulates stacked weight grads
  across the sequential grid.  Dropout masks regenerate from the on-core
  PRNG seeded per (tile, layer) — bit-identical in fwd and bwd, nothing
  stored.

Semantics per layer match ``ops/pallas_encoder.py`` / torch 1.5
``TransformerEncoderLayer`` exactly: attn(drop) -> drop -> +res -> LN1 ->
FFN(relu, drop) -> drop -> +res -> LN2, single head, neighborhood axis.
``fused_u2gnn_encoder_reference`` is the pure-jnp twin for tests.
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

from graph_transformer_tpu.ops.pallas_encoder import (
    _block_mask,
    _dotT_lhs,
    _dotT_rhs,
    tile_rows,
)
from graph_transformer_tpu.ops.pallas_ffn import (
    _dropout_mask,
    _pad_rows,
    _seed_arr,
    on_tpu,
)

_EPS = 1e-5


def _slot0(x, S):
    """Rows 0, S, 2S, ... of a [R, D] tile -> [R/S, D]."""
    R, D = x.shape
    return x.reshape(R // S, S, D)[:, 0, :]


def _spread0(x0, S):
    """[G, D] -> [G*S, D] with x0 in slot-0 rows, zeros elsewhere."""
    G, D = x0.shape
    z = jnp.zeros((G, S - 1, D), x0.dtype)
    return jnp.concatenate([x0[:, None, :], z], axis=1).reshape(G * S, D)


def _ln_fwd(u, g, b):
    mu = jnp.mean(u, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(u - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    uhat = (u - mu) * rstd
    return uhat * g + b, uhat, rstd


def _ln_bwd(dout, uhat, rstd, g):
    gg = dout * g
    du = (gg - jnp.mean(gg, axis=-1, keepdims=True)
          - uhat * jnp.mean(gg * uhat, axis=-1, keepdims=True)) * rstd
    return (du, jnp.sum(dout * uhat, axis=0, keepdims=True),
            jnp.sum(dout, axis=0, keepdims=True))


def _layer_fwd(x, p, *, S, rate, slot0_only, want_residuals,
               mm_dtype=jnp.bfloat16):
    """One encoder layer over a [R, D] f32 tile.

    ``slot0_only``: compute attention queries / FFN / output only for the
    slot-0 row of each neighborhood (keys/values still span all rows) —
    valid only for the final layer, whose other rows are discarded.
    Returns [R, D], or [R/S, D] when slot0_only.

    Dropout draw ORDER is fixed (attn, attn_out, ffn-hidden, ffn-out) so the
    backward regenerates identical masks from the same per-(tile, layer)
    PRNG seed.
    """
    R, D = x.shape
    mm = mm_dtype
    keep = 1.0 - rate
    w_in, b_in, w_out, b_out, ln1g, ln1b, w1, b1, w2, b2, ln2g, ln2b = p

    qkv = jnp.dot(x.astype(mm), w_in.astype(mm),
                  preferred_element_type=jnp.float32) + b_in
    q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]
    if slot0_only:
        G = R // S
        q0 = _slot0(q, S)  # [G, D]
        scores = _dotT_rhs(q0.astype(mm), k.astype(mm)) / math.sqrt(D)
        # row g may attend only to columns of neighborhood g
        col_grp = jax.lax.broadcasted_iota(jnp.int32, (G, R), 1) // S
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (G, R), 0)
        scores = jnp.where(col_grp == row_idx, scores, -1e30)
        x_res = _slot0(x, S)
    else:
        scores = _dotT_rhs(q.astype(mm), k.astype(mm)) / math.sqrt(D)
        scores = jnp.where(_block_mask(R, S), scores, -1e30)
        x_res = x
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
    y1, uhat1, rstd1 = _ln_fwd(x_res + a, ln1g, ln1b)

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
    out, uhat2, rstd2 = _ln_fwd(y1 + z, ln2g, ln2b)
    if not want_residuals:
        return out
    # VMEM note: the big dropout masks are NOT kept — m_h/keep == h/hpre and
    # m_attn/keep == attn_d/attn exactly (multiply-by-2 is exact in fp), so
    # backward reconstructs them by division instead of holding another
    # [R, F] + [R, R] f32 in VMEM (the difference between fitting in the
    # 16 MB scoped-vmem budget at tile 504 and spilling).
    return out, dict(q=q, k=k, v=v, attn=attn, attn_d=attn_d, ctx=ctx,
                     m_a=m_a, m_z=m_z,
                     uhat1=uhat1, rstd1=rstd1, y1=y1, hpre=hpre, h=h,
                     uhat2=uhat2, rstd2=rstd2, x_res=x_res)


def _layer_bwd(x, p, r, dout, *, S, rate, slot0_only,
               mm_dtype=jnp.bfloat16, ffn_factor=None):
    """Backward of one layer given its input ``x``, residuals ``r`` and
    ``dout`` (shape [R/S, D] when slot0_only else [R, D]).

    ``ffn_factor``: optional precomputed relu'·dropout multiplier for the
    FFN hidden (the stored-residual path supplies ``(h>0)/keep``, which is
    EXACT — ``h = relu(hpre)·m/keep`` is positive iff kept and hpre>0 —
    so ``hpre`` need not be stored or recomputed).

    Returns (dx [R, D], per-param grads tuple matching ``p``'s order)."""
    R, D = x.shape
    mm = mm_dtype
    keep = 1.0 - rate
    w_in, b_in, w_out, b_out, ln1g, ln1b, w1, b1, w2, b2, ln2g, ln2b = p

    du2, dln2g, dln2b = _ln_bwd(dout, r["uhat2"], r["rstd2"], ln2g)
    dz = du2 * r["m_z"] / keep if rate > 0.0 else du2
    db2 = jnp.sum(dz, axis=0, keepdims=True)
    dw2 = _dotT_lhs(r["h"].astype(mm), dz.astype(mm))
    dh = _dotT_rhs(dz.astype(mm), w2.astype(mm))
    if ffn_factor is not None:
        dh = dh * ffn_factor
    else:
        # relu' and the hidden dropout mask in one factor:
        # h = relu(hpre)*m/keep => h/hpre == m/keep exactly where hpre > 0
        # (x2.0 is exact), 0 elsewhere
        dh = dh * jnp.where(r["hpre"] > 0.0, r["h"] / r["hpre"], 0.0)
    db1 = jnp.sum(dh, axis=0, keepdims=True)
    dw1 = _dotT_lhs(r["y1"].astype(mm), dh.astype(mm))
    dy1 = du2 + _dotT_rhs(dh.astype(mm), w1.astype(mm))

    du1, dln1g, dln1b = _ln_bwd(dy1, r["uhat1"], r["rstd1"], ln1g)
    da = du1 * r["m_a"] / keep if rate > 0.0 else du1
    db_out = jnp.sum(da, axis=0, keepdims=True)
    dw_out = _dotT_lhs(r["ctx"].astype(mm), da.astype(mm))
    dctx = _dotT_rhs(da.astype(mm), w_out.astype(mm))
    dattn_d = _dotT_rhs(dctx.astype(mm), r["v"].astype(mm))
    dv = _dotT_lhs(r["attn_d"].astype(mm), dctx.astype(mm))  # [R, D]
    # attention dropout mask from the kept probs: attn_d/attn == m/keep
    # where attn > 0; off-block entries have attn == 0 -> ds == 0 anyway
    dattn = (dattn_d * jnp.where(r["attn"] > 0.0, r["attn_d"] / r["attn"], 0.0)
             if rate > 0.0 else dattn_d)
    ds = r["attn"] * (dattn - jnp.sum(dattn * r["attn"], axis=-1,
                                      keepdims=True))
    ds = ds / math.sqrt(D)
    if slot0_only:
        q0 = _slot0(r["q"], S)
        dq0 = jnp.dot(ds.astype(mm), r["k"].astype(mm),
                      preferred_element_type=jnp.float32)  # [G, D]
        dq = _spread0(dq0, S)  # [R, D]
        dk = _dotT_lhs(ds.astype(mm), q0.astype(mm))  # [R, D]
        du1_full = _spread0(du1, S)
    else:
        dq = jnp.dot(ds.astype(mm), r["k"].astype(mm),
                     preferred_element_type=jnp.float32)
        dk = _dotT_lhs(ds.astype(mm), r["q"].astype(mm))
        du1_full = du1
    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)  # [R, 3D]
    db_in = jnp.sum(dqkv, axis=0, keepdims=True)
    dw_in = _dotT_lhs(x.astype(mm), dqkv.astype(mm))
    dx = du1_full + _dotT_rhs(dqkv.astype(mm), w_in.astype(mm))
    return dx, (dw_in, db_in, dw_out, db_out, dln1g, dln1b,
                dw1, db1, dw2, db2, dln2g, dln2b)


def _params_at(refs, t, stored):
    """Slice layer ``t % stored`` from the stacked [stored, ...] param refs,
    as f32, with 1-D params kept 2-D [1, n] (broadcast-adds)."""
    ts = t % stored
    out = []
    for j, ref in enumerate(refs):
        arr = ref[ts]
        if arr.ndim == 1:
            arr = arr.reshape(1, -1)
        out.append(arr.astype(jnp.float32))
    return tuple(out)


# Backward implementation choice (the ``mega_bwd`` static argument of
# ``fused_u2gnn_encoder``; an explicit trace-time argument rather than a
# mutable module global so a stale jit cache can never silently pin the
# wrong backward — ADVICE r3).  The T-unrolled mega-bwd kernel
# (_bwd_kernel) was MEASURED SLOWER than the per-layer chain on v5e at
# bench shapes (7.3-11.1 ms vs 6.2: >16 MB scoped VMEM at tile 504 spills;
# at tile 288 the stacked-grad `ref[t] +=` + _spread0 relayouts dominate —
# BASELINE.md round-3 notes).  The default backward is therefore the
# HYBRID: mega forward (keeps the tile resident across layers + slot0-only
# last layer) + a chain of per-layer bwd pallas_calls driven from the
# forward's saved layer inputs — one layer's residuals live at a time, so
# tile 504 fits VMEM and the last layer's bwd also gets the slot0-only
# saving.  mega_bwd=True re-selects the recorded dead end for A/B runs.


def _seed_layer(seed_ref, i, t, T):
    # One PRNG stream per (tile, layer): fwd and bwd re-seed identically.
    # Stream layout is t * n_tiles + i (layer-major) so the hybrid backward
    # can replay layer t's streams from a single-layer kernel whose own
    # per-tile offset is +i (base seed shifted by t * n_tiles outside).
    pltpu.prng_seed(seed_ref[0, 0] + t * pl.num_programs(0) + i)


def _fwd_kernel(seed_ref, x_ref, *refs, S, rate, T, stored):
    param_refs = refs[:12]
    out_ref = refs[12]
    saved_refs = refs[13:]  # T-1 layer-input outputs
    i = pl.program_id(0)
    mm = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    h = x_ref[:].astype(jnp.float32)
    for t in range(T):
        if t > 0:
            saved_refs[t - 1][:] = h.astype(saved_refs[t - 1].dtype)
        if rate > 0.0:
            _seed_layer(seed_ref, i, t, T)
        h = _layer_fwd(h, _params_at(param_refs, t, stored), S=S, rate=rate,
                       slot0_only=(t == T - 1), want_residuals=False,
                       mm_dtype=mm)
    out_ref[:] = h.astype(out_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, *refs, S, rate, T, stored):
    param_refs = refs[:12]
    saved_refs = refs[12:12 + max(T - 1, 0)]
    dout_ref = refs[12 + max(T - 1, 0)]
    dx_ref = refs[13 + max(T - 1, 0)]
    grad_refs = refs[14 + max(T - 1, 0):]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for ref in grad_refs:
            ref[:] = jnp.zeros_like(ref)

    mm = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    g = dout_ref[:].astype(jnp.float32)
    for t in range(T - 1, -1, -1):
        x_t = (x_ref[:] if t == 0 else saved_refs[t - 1][:]).astype(
            jnp.float32)
        if rate > 0.0:
            _seed_layer(seed_ref, i, t, T)
        p = _params_at(param_refs, t, stored)
        _, r = _layer_fwd(x_t, p, S=S, rate=rate,
                          slot0_only=(t == T - 1), want_residuals=True,
                          mm_dtype=mm)
        g, grads = _layer_bwd(x_t, p, r, g, S=S, rate=rate,
                              slot0_only=(t == T - 1), mm_dtype=mm)
        ts = t % stored
        for ref, dg in zip(grad_refs, grads):
            ref[ts] += dg.reshape(ref.shape[1:])
    dx_ref[:] = g.astype(dx_ref.dtype)


def _bwd1_kernel(seed_ref, x_ref, *refs, S, rate, slot0):
    """Backward of ONE layer over one [R, D] tile: recompute the layer's
    internals from its input (saved by the mega forward), then _layer_bwd.
    Weight grads accumulate across the sequential grid (full-block outs)."""
    param_refs = refs[:12]
    dout_ref = refs[12]
    dx_ref = refs[13]
    grad_refs = refs[14:]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for ref in grad_refs:
            ref[:] = jnp.zeros_like(ref)

    mm = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + i)
    x = x_ref[:].astype(jnp.float32)
    p = tuple(r[:].astype(jnp.float32) for r in param_refs)
    _, res = _layer_fwd(x, p, S=S, rate=rate, slot0_only=slot0,
                        want_residuals=True, mm_dtype=mm)
    dx, grads = _layer_bwd(x, p, res, dout_ref[:].astype(jnp.float32),
                           S=S, rate=rate, slot0_only=slot0, mm_dtype=mm)
    dx_ref[:] = dx.astype(dx_ref.dtype)
    for ref, dg in zip(grad_refs, grads):
        ref[:] += dg.reshape(ref.shape)


def _bwd1_call(x_pad, params_t, seed_arr, g, *, S, rate, slot0, R,
               interpret):
    """One pallas_call: backward of a single layer over all tiles.

    ``x_pad`` [rows_pad, D] is the layer's input (tile-padded), ``params_t``
    the layer's 12 unstacked params, ``g`` the output cotangent —
    [rows_pad/S, D] when ``slot0`` (last layer: only self rows were
    produced) else [rows_pad, D].  Returns (dx f32 [rows_pad, D],
    12 f32 param grads)."""
    rows_pad, D = x_pad.shape
    grid = (rows_pad // R,)
    G = R // S
    p2 = [a if a.ndim == 2 else a.reshape(1, -1) for a in params_t]
    param_specs = [_full_spec(a.shape) for a in p2]
    dout_spec = (pl.BlockSpec((G, D), lambda i: (i, 0)) if slot0
                 else pl.BlockSpec((R, D), lambda i: (i, 0)))
    outs = pl.pallas_call(
        functools.partial(_bwd1_kernel, S=S, rate=rate, slot0=slot0),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0)),
                  pl.BlockSpec((R, D), lambda i: (i, 0))] + param_specs
        + [dout_spec],
        out_specs=[pl.BlockSpec((R, D), lambda i: (i, 0))]
        + param_specs,
        out_shape=[jax.ShapeDtypeStruct((rows_pad, D), jnp.float32)]
        + [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in p2],
        interpret=interpret,
    )(seed_arr, x_pad, *p2, g)
    return outs[0], outs[1:]


# ---------------------------------------------------------------- dispatcher
def _full_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape))


def _stacked_param_specs(stored, D, F):
    shapes = [
        (stored, D, 3 * D), (stored, 3 * D),
        (stored, D, D), (stored, D),
        (stored, D), (stored, D),
        (stored, D, F), (stored, F),
        (stored, F, D), (stored, D),
        (stored, D), (stored, D),
    ]
    return [_full_spec(s) for s in shapes], shapes


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def fused_u2gnn_encoder(x2d, params, seed,
                        seq_len: int, num_timesteps: int,
                        rate: float = 0.0, tile_target: int = 512,
                        interpret: bool = False, mega_bwd: bool = False):
    """T-layer encoder over node-major ``x2d [N*S, D]`` returning the
    slot-0 (self) rows of the final layer: ``[N, D]`` f32.

    ``params``: tuple of 12 stacked arrays with leading dim ``stored``
    (w_in, b_in, w_out, b_out, ln1_scale, ln1_bias, w_ff1, b_ff1, w_ff2,
    b_ff2, ln2_scale, ln2_bias) — ``TransformerEncoderParams`` field order.
    Timestep t uses slice ``t % stored`` (weight-tied replay when
    stored < num_timesteps).  ``seed``: int32 for in-kernel dropout."""
    out, _ = _fwd_call(x2d, params, seed, seq_len, num_timesteps, rate,
                       tile_target, interpret)
    return out


def _fwd_call(x2d, params, seed, S, T, rate, tile_target, interpret):
    stored = params[0].shape[0]
    D = params[0].shape[1]
    F = params[6].shape[2]
    R = tile_rows(S, tile_target)
    xp, m = _pad_rows(x2d, R)
    rows_pad = xp.shape[0]
    grid = (rows_pad // R,)
    G = R // S
    n_out = rows_pad // S
    param_specs, _ = _stacked_param_specs(stored, D, F)
    n_saved = max(T - 1, 0)
    out_specs = [pl.BlockSpec((G, D), lambda i: (i, 0))] + [
        pl.BlockSpec((R, D), lambda i: (i, 0)) for _ in range(n_saved)
    ]
    out_shape = [jax.ShapeDtypeStruct((n_out, D), jnp.float32)] + [
        jax.ShapeDtypeStruct((rows_pad, D), x2d.dtype) for _ in range(n_saved)
    ]
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, S=S, rate=rate, T=T, stored=stored),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0)),
                  pl.BlockSpec((R, D), lambda i: (i, 0))] + param_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(_seed_arr(seed), xp, *params)
    out, saved = outs[0], outs[1:]
    return out[:m // S], (xp, m, tuple(saved))


def _fwd_rule(x2d, params, seed, S, T, rate, tile_target, interpret,
              mega_bwd):
    out, (xp, m, saved) = _fwd_call(x2d, params, seed, S, T, rate,
                                    tile_target, interpret)
    return out, (x2d, params, seed, saved)


def _bwd_rule(S, T, rate, tile_target, interpret, mega_bwd, res, dout):
    if mega_bwd:
        return _bwd_rule_mega(S, T, rate, tile_target, interpret, res, dout)
    return _bwd_rule_hybrid(S, T, rate, tile_target, interpret, res, dout)


def _bwd_rule_hybrid(S, T, rate, tile_target, interpret, res, dout):
    """Per-layer backward chain from the mega forward's saved layer inputs:
    T single-layer pallas_calls, each recomputing one layer's internals in
    VMEM (ROADMAP round-3 item 6 — the forward win without the mega-bwd's
    VMEM spills).  The last layer runs its slot0-only backward: its FFN
    recompute + grads touch only the R/S self rows the forward produced."""
    x2d, params, seed, saved = res
    stored = params[0].shape[0]
    R = tile_rows(S, tile_target)
    xp, m = _pad_rows(x2d, R)
    rows_pad = xp.shape[0]
    n_tiles = rows_pad // R
    G = R // S
    seed0 = _seed_arr(seed)
    # output cotangent of the last (slot0-only) layer: [N, D] -> padded G-rows
    g, _ = _pad_rows(dout.astype(jnp.float32), G)
    # per-stored-slice param-grad accumulators (f32, 2-D broadcast shapes)
    acc = [[None] * 12 for _ in range(stored)]
    for t in range(T - 1, -1, -1):
        x_t = xp if t == 0 else saved[t - 1]
        params_t = [a[t % stored] for a in params]
        g, grads = _bwd1_call(
            x_t, params_t, seed0 + t * n_tiles, g,
            S=S, rate=rate, slot0=(t == T - 1), R=R, interpret=interpret,
        )
        ts = t % stored
        for j, dg in enumerate(grads):
            acc[ts][j] = dg if acc[ts][j] is None else acc[ts][j] + dg
    dx = g[:m].astype(x2d.dtype)
    dparams = []
    for j, p in enumerate(params):
        slices = [
            (acc[ts][j].reshape(p.shape[1:]) if acc[ts][j] is not None
             else jnp.zeros(p.shape[1:], jnp.float32))
            for ts in range(stored)
        ]
        dparams.append(jnp.stack(slices).astype(p.dtype))
    import numpy as _np

    seed_ct = (None if seed is None
               else _np.zeros(_np.shape(seed), jax.dtypes.float0))
    return dx, tuple(dparams), seed_ct


def _bwd_rule_mega(S, T, rate, tile_target, interpret, res, dout):
    x2d, params, seed, saved = res
    stored = params[0].shape[0]
    D = params[0].shape[1]
    F = params[6].shape[2]
    R = tile_rows(S, tile_target)
    xp, m = _pad_rows(x2d, R)
    rows_pad = xp.shape[0]
    grid = (rows_pad // R,)
    G = R // S
    dout_p, _ = _pad_rows(dout.astype(jnp.float32), R // S)
    param_specs, param_shapes = _stacked_param_specs(stored, D, F)
    n_saved = max(T - 1, 0)
    saved_specs = [pl.BlockSpec((R, D), lambda i: (i, 0))
                   for _ in range(n_saved)]
    grad_specs = [_full_spec(s) for s in param_shapes]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, S=S, rate=rate, T=T, stored=stored),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0)),
                  pl.BlockSpec((R, D), lambda i: (i, 0))] + param_specs
        + saved_specs + [pl.BlockSpec((G, D), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((R, D), lambda i: (i, 0))] + grad_specs,
        out_shape=[jax.ShapeDtypeStruct((rows_pad, D), x2d.dtype)]
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s in param_shapes],
        interpret=interpret,
    )(_seed_arr(seed), xp, *params, *saved, dout_p)
    dx = outs[0][:m]
    dparams = tuple(
        dg.astype(p.dtype) for dg, p in zip(outs[1:], params)
    )
    import numpy as _np

    seed_ct = (None if seed is None
               else _np.zeros(_np.shape(seed), jax.dtypes.float0))
    return dx, dparams, seed_ct


fused_u2gnn_encoder.defvjp(_fwd_rule, _bwd_rule)


# ----------------------------------------------------------------- reference
def fused_u2gnn_encoder_reference(x3d, params, num_timesteps: int):
    """Deterministic pure-jnp twin over ``[N, S, D]``: T encoder layers
    (replaying stacked params cyclically) then slot 0 — for parity tests."""
    from graph_transformer_tpu.ops.pallas_encoder import (
        fused_encoder_layer_reference,
    )

    stored = params[0].shape[0]
    names = ["w_in", "b_in", "w_out", "b_out", "ln1_scale", "ln1_bias",
             "w_ff1", "b_ff1", "w_ff2", "b_ff2", "ln2_scale", "ln2_bias"]
    h = x3d
    for t in range(num_timesteps):
        p = {n: a[t % stored] for n, a in zip(names, params)}
        h = fused_encoder_layer_reference(h, p)
    return h[:, 0, :].astype(jnp.float32)
