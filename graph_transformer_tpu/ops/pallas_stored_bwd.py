"""Stored-residual whole-encoder U2GNN: mega forward that WRITES each
layer's residuals, and a per-layer backward that reads them instead of
recomputing the layer (the BASELINE.md round-4 "named next optimization",
attempted in round 4's remaining budget).

Why this pencils out (all numbers measured on v5e at bench shapes,
79,488 rows/layer, D=4, F=1024, S=9, T=4):

- Today's hybrid backward re-runs each layer's forward from its saved
  input (~0.95 ms) before the bwd math (~0.6 ms).
- The FFN hidden ``h`` [R, F] — the residual judged too big to keep in
  round 3's VMEM-bound mega-bwd — is cheap to stream through HBM: bf16
  163 MB/layer ≈ 0.2 ms each way at 819 GB/s.
- The relu'·dropout multiplier needs NO extra storage: ``h =
  relu(hpre)·m/keep`` is positive exactly when the unit was kept and
  ``hpre > 0``, so the factor is ``(h > 0)/keep`` — exact, from ``h``
  alone (see ``_layer_bwd(ffn_factor=...)``).
- Everything else the backward touches is [R, ~D]-class (qkv, ctx, y1,
  LN stats, the two small dropout masks — stored f32, ~12 MB/layer)
  EXCEPT the attention probs, whose dense [R, R] form is recomputed
  from the stored q/k (scores matmul + softmax + first-PRNG-draw mask
  replay ≈ 0.2 ms — a fraction of the full recompute).

PRNG discipline: the forward draws per (tile, layer) in the fixed order
(attn, attn_out, ffn-hidden, ffn-out); the stored backward re-seeds the
same stream and draws ONLY the attention mask (the first draw), so it
replays bit-identically without paying the [R, F] hidden-mask
generation.

Selected via ``fused_u2gnn_encoder(..., stored_bwd=True)``'s sibling
entry point here; A/B: ``scripts/bench_stored_bwd.py``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pragma: no cover - off-TPU fallback
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False

from graph_transformer_tpu.ops.pallas_encoder import (
    _block_mask,
    _dotT_rhs,
    tile_rows,
)
from graph_transformer_tpu.ops.pallas_ffn import (
    _dropout_mask,
    _pad_rows,
    _seed_arr,
)
from graph_transformer_tpu.ops.pallas_u2gnn import (
    _full_spec,
    _layer_bwd,
    _layer_fwd,
    _params_at,
    _seed_layer,
    _slot0,
    _stacked_param_specs,
)

__all__ = [
    "fused_u2gnn_encoder_sampled_stored",
    "fused_u2gnn_encoder_stored",
]

# residual layout in the per-layer "smg" strip (f32):
# [ctx(D) | y1(D) | uhat1(D) | uhat2(D) | m_a(D) | m_z(D) | rstd1 | rstd2]
_SMG_BLOCKS = 6  # D-wide blocks before the two rstd columns


def _smg_width(D):
    return _SMG_BLOCKS * D + 2


def _pack_smg(r, D):
    return jnp.concatenate(
        [r["ctx"], r["y1"], r["uhat1"], r["uhat2"],
         (r["m_a"] if r["m_a"] is not None
          else jnp.ones_like(r["ctx"])),
         (r["m_z"] if r["m_z"] is not None
          else jnp.ones_like(r["ctx"])),
         r["rstd1"], r["rstd2"]],
        axis=1,
    )


def _unpack_smg(smg, D):
    blocks = [smg[:, i * D:(i + 1) * D] for i in range(_SMG_BLOCKS)]
    ctx, y1, uhat1, uhat2, m_a, m_z = blocks
    rstd1 = smg[:, _SMG_BLOCKS * D:_SMG_BLOCKS * D + 1]
    rstd2 = smg[:, _SMG_BLOCKS * D + 1:_SMG_BLOCKS * D + 2]
    return ctx, y1, uhat1, uhat2, m_a, m_z, rstd1, rstd2


# ------------------------------------------------------------------ forward
def _stored_fwd_kernel(seed_ref, x_ref, *refs, S, rate, T, stored):
    param_refs = refs[:12]
    out_ref = refs[12]
    saved_refs = refs[13:13 + max(T - 1, 0)]
    qkv_refs = refs[13 + max(T - 1, 0):13 + max(T - 1, 0) + T]
    smg_refs = refs[13 + max(T - 1, 0) + T:13 + max(T - 1, 0) + 2 * T]
    h_refs = refs[13 + max(T - 1, 0) + 2 * T:]
    i = pl.program_id(0)
    mm = jnp.bfloat16 if x_ref.dtype == jnp.bfloat16 else jnp.float32
    h = x_ref[:].astype(jnp.float32)
    D = h.shape[1]
    for t in range(T):
        if t > 0:
            saved_refs[t - 1][:] = h.astype(saved_refs[t - 1].dtype)
        if rate > 0.0:
            _seed_layer(seed_ref, i, t, T)
        h, r = _layer_fwd(h, _params_at(param_refs, t, stored), S=S,
                          rate=rate, slot0_only=(t == T - 1),
                          want_residuals=True, mm_dtype=mm)
        qkv_refs[t][:] = jnp.concatenate(
            [r["q"], r["k"], r["v"]], axis=1
        ).astype(qkv_refs[t].dtype)
        smg_refs[t][:] = _pack_smg(r, D).astype(smg_refs[t].dtype)
        h_refs[t][:] = r["h"].astype(h_refs[t].dtype)
    out_ref[:] = h.astype(out_ref.dtype)


def _stored_fwd_call(x2d, params, seed, S, T, rate, tile_target, interpret):
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
    smw = _smg_width(D)

    def rows_t(t):
        return (n_out, G) if t == T - 1 else (rows_pad, R)

    out_specs = (
        [pl.BlockSpec((G, D), lambda i: (i, 0))]
        + [pl.BlockSpec((R, D), lambda i: (i, 0)) for _ in range(n_saved)]
        + [pl.BlockSpec((R, 3 * D), lambda i: (i, 0)) for _ in range(T)]
        + [pl.BlockSpec((rows_t(t)[1], smw), lambda i: (i, 0))
           for t in range(T)]
        + [pl.BlockSpec((rows_t(t)[1], F), lambda i: (i, 0))
           for t in range(T)]
    )
    out_shape = (
        [jax.ShapeDtypeStruct((n_out, D), jnp.float32)]
        + [jax.ShapeDtypeStruct((rows_pad, D), x2d.dtype)
           for _ in range(n_saved)]
        + [jax.ShapeDtypeStruct((rows_pad, 3 * D), jnp.float32)
           for _ in range(T)]
        + [jax.ShapeDtypeStruct((rows_t(t)[0], smw), jnp.float32)
           for t in range(T)]
        # h stored in the input dtype: bf16 runs stream bf16 (what the
        # matmuls consume anyway); f32 runs stay bit-identical to the
        # recompute path (mm is f32 there, so bf16 storage would round)
        + [jax.ShapeDtypeStruct((rows_t(t)[0], F), x2d.dtype)
           for t in range(T)]
    )
    outs = pl.pallas_call(
        functools.partial(_stored_fwd_kernel, S=S, rate=rate, T=T,
                          stored=stored),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0)),
                  pl.BlockSpec((R, D), lambda i: (i, 0))] + param_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(_seed_arr(seed), xp, *params)
    out = outs[0]
    saved = tuple(outs[1:1 + n_saved])
    qkvs = tuple(outs[1 + n_saved:1 + n_saved + T])
    smgs = tuple(outs[1 + n_saved + T:1 + n_saved + 2 * T])
    hs = tuple(outs[1 + n_saved + 2 * T:])
    return out[:m // S], (xp, m, saved, qkvs, smgs, hs)


# ----------------------------------------------------------------- backward
def _stored_bwd1_kernel(seed_ref, x_ref, qkv_ref, smg_ref, h_ref, *refs,
                        S, rate, slot0):
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
    keep = 1.0 - rate
    x = x_ref[:].astype(jnp.float32)
    R, D = x.shape
    p = tuple(r[:].astype(jnp.float32) for r in param_refs)
    qkv = qkv_ref[:].astype(jnp.float32)
    q, k, v = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]
    ctx, y1, uhat1, uhat2, m_a, m_z, rstd1, rstd2 = _unpack_smg(
        smg_ref[:].astype(jnp.float32), D
    )
    h = h_ref[:].astype(jnp.float32)

    # --- recompute the dense attention probs from stored q/k (the only
    # residual whose dense form is too big to store)
    if slot0:
        G = R // S
        q0 = _slot0(q, S)
        scores = _dotT_rhs(q0.astype(mm), k.astype(mm)) / math.sqrt(D)
        col_grp = jax.lax.broadcasted_iota(jnp.int32, (G, R), 1) // S
        row_idx = jax.lax.broadcasted_iota(jnp.int32, (G, R), 0)
        scores = jnp.where(col_grp == row_idx, scores, -1e30)
    else:
        scores = _dotT_rhs(q.astype(mm), k.astype(mm)) / math.sqrt(D)
        scores = jnp.where(_block_mask(R, S), scores, -1e30)
    attn = jax.nn.softmax(scores, axis=-1)
    if rate > 0.0:
        # replay the forward's per-(tile, layer) stream; the attention mask
        # is the FIRST draw, so nothing else need be generated
        pltpu.prng_seed(seed_ref[0, 0] + i)
        m_attn = _dropout_mask(attn.shape, rate)
        attn_d = attn * m_attn / keep
    else:
        attn_d = attn

    ffn_factor = (h > 0.0).astype(jnp.float32) * (1.0 / keep if rate > 0.0
                                                  else 1.0)
    r = dict(q=q, k=k, v=v, attn=attn, attn_d=attn_d, ctx=ctx,
             m_a=(m_a if rate > 0.0 else None),
             m_z=(m_z if rate > 0.0 else None),
             uhat1=uhat1, rstd1=rstd1, y1=y1, hpre=None, h=h,
             uhat2=uhat2, rstd2=rstd2)
    dx, grads = _layer_bwd(x, p, r, dout_ref[:].astype(jnp.float32),
                           S=S, rate=rate, slot0_only=slot0, mm_dtype=mm,
                           ffn_factor=ffn_factor)
    dx_ref[:] = dx.astype(dx_ref.dtype)
    for ref, dg in zip(grad_refs, grads):
        ref[:] += dg.reshape(ref.shape)


def _stored_bwd1_call(x_pad, params_t, seed_arr, qkv, smg, h, g, *,
                      S, rate, slot0, R, F, interpret):
    rows_pad, D = x_pad.shape
    grid = (rows_pad // R,)
    G = R // S
    smw = _smg_width(D)
    rt = G if slot0 else R
    p2 = [a if a.ndim == 2 else a.reshape(1, -1) for a in params_t]
    param_specs = [_full_spec(a.shape) for a in p2]
    dout_spec = (pl.BlockSpec((G, D), lambda i: (i, 0)) if slot0
                 else pl.BlockSpec((R, D), lambda i: (i, 0)))
    outs = pl.pallas_call(
        functools.partial(_stored_bwd1_kernel, S=S, rate=rate, slot0=slot0),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0)),
                  pl.BlockSpec((R, D), lambda i: (i, 0)),
                  pl.BlockSpec((R, 3 * D), lambda i: (i, 0)),
                  pl.BlockSpec((rt, smw), lambda i: (i, 0)),
                  pl.BlockSpec((rt, F), lambda i: (i, 0))]
        + param_specs + [dout_spec],
        out_specs=[pl.BlockSpec((R, D), lambda i: (i, 0))] + param_specs,
        out_shape=[jax.ShapeDtypeStruct((rows_pad, D), jnp.float32)]
        + [jax.ShapeDtypeStruct(a.shape, jnp.float32) for a in p2],
        interpret=interpret,
    )(seed_arr, x_pad, qkv, smg, h, *p2, g)
    return outs[0], outs[1:]


# --------------------------------------------------------------- public api
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_u2gnn_encoder_stored(x2d, params, seed,
                               seq_len: int, num_timesteps: int,
                               rate: float = 0.0, tile_target: int = 512,
                               interpret: bool = False):
    """Same contract as ``fused_u2gnn_encoder``, with the stored-residual
    backward: the forward writes each layer's residuals (h, qkv, small
    strip) and the backward reads them instead of recomputing the layer."""
    out, _ = _stored_fwd_call(x2d, params, seed, seq_len, num_timesteps,
                              rate, tile_target, interpret)
    return out


def _stored_fwd_rule(x2d, params, seed, S, T, rate, tile_target, interpret):
    out, (xp, m, saved, qkvs, smgs, hs) = _stored_fwd_call(
        x2d, params, seed, S, T, rate, tile_target, interpret
    )
    return out, (x2d, params, seed, saved, qkvs, smgs, hs)


def _stored_bwd_core(xp, params, seed, saved, qkvs, smgs, hs, dout_pad, *,
                     S, T, rate, R, interpret):
    """The T-layer stored backward chain over tile-padded inputs: returns
    (dx over all padded rows, stacked dparams)."""
    stored = params[0].shape[0]
    F = params[6].shape[2]
    rows_pad = xp.shape[0]
    n_tiles = rows_pad // R
    seed0 = _seed_arr(seed)
    g = dout_pad
    acc = [[None] * 12 for _ in range(stored)]
    for t in range(T - 1, -1, -1):
        x_t = xp if t == 0 else saved[t - 1]
        params_t = [a[t % stored] for a in params]
        g, grads = _stored_bwd1_call(
            x_t, params_t, seed0 + t * n_tiles, qkvs[t], smgs[t], hs[t], g,
            S=S, rate=rate, slot0=(t == T - 1), R=R, F=F,
            interpret=interpret,
        )
        ts = t % stored
        for j, dg in enumerate(grads):
            acc[ts][j] = dg if acc[ts][j] is None else acc[ts][j] + dg
    dparams = []
    for j, p in enumerate(params):
        slices = [
            (acc[ts][j].reshape(p.shape[1:]) if acc[ts][j] is not None
             else jnp.zeros(p.shape[1:], jnp.float32))
            for ts in range(stored)
        ]
        dparams.append(jnp.stack(slices).astype(p.dtype))
    return g, tuple(dparams)


def _stored_bwd_rule(S, T, rate, tile_target, interpret, res, dout):
    x2d, params, seed, saved, qkvs, smgs, hs = res
    R = tile_rows(S, tile_target)
    xp, m = _pad_rows(x2d, R)
    G = R // S
    g, _ = _pad_rows(dout.astype(jnp.float32), G)
    g, dparams = _stored_bwd_core(xp, params, seed, saved, qkvs, smgs, hs,
                                  g, S=S, T=T, rate=rate, R=R,
                                  interpret=interpret)
    dx = g[:m].astype(x2d.dtype)
    seed_ct = (None if seed is None
               else np.zeros(np.shape(seed), jax.dtypes.float0))
    return dx, dparams, seed_ct


fused_u2gnn_encoder_stored.defvjp(_stored_fwd_rule, _stored_bwd_rule)


# ------------------------------------------------- sampled + stored variant
def _sampled_stored_fwd_kernel(seed_ref, tag_rows_ref, deg_ref, self_tag_ref,
                               code_ref, *refs, S, rate, T, stored):
    """Sampling preamble of ``pallas_sampled_encoder._sampled_fwd_kernel``
    (same PRNG stream layout: sampler on stream ``T·n_tiles + i``, dropout
    on ``t·n_tiles + i``) feeding the residual-writing forward of
    ``_stored_fwd_kernel``."""
    param_refs = refs[:12]
    out_ref = refs[12]
    x0_ref = refs[13]
    n_saved = max(T - 1, 0)
    saved_refs = refs[14:14 + n_saved]
    qkv_refs = refs[14 + n_saved:14 + n_saved + T]
    smg_refs = refs[14 + n_saved + T:14 + n_saved + 2 * T]
    h_refs = refs[14 + n_saved + 2 * T:]
    i = pl.program_id(0)
    G = tag_rows_ref.shape[0]

    # ---- sample neighbor tags (disjoint stream: T·n_tiles + i)
    pltpu.prng_seed(seed_ref[0, 0] + T * pl.num_programs(0) + i)
    bits = pltpu.bitcast(
        pltpu.prng_random_bits(tag_rows_ref.shape), jnp.uint32
    )
    u = (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    # hub clamp: rows with deg > 128 hold a uniform 128-subsample
    # (sampling/pallas_sampler.py module docstring)
    deg = jnp.clip(deg_ref[:], 1, 128).astype(jnp.float32)  # [G, 1]
    idx = jnp.minimum(jnp.floor(u * deg), deg - 1.0).astype(jnp.int32)
    tags = jnp.take_along_axis(tag_rows_ref[:], idx, axis=1)  # [G, 128]

    # ---- [R, D] layer-0 input in VMEM: onehot(tag) @ codebook
    all_tags = jnp.concatenate(
        [self_tag_ref[:], tags[:, : S - 1]], axis=1
    )  # [G, S]
    n_codes = code_ref.shape[0]
    onehot3 = (
        all_tags[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (G, S, n_codes), 2)
    ).astype(jnp.float32)
    onehot = onehot3.reshape(G * S, n_codes)
    x = jnp.dot(onehot, code_ref[:], preferred_element_type=jnp.float32)
    # saved-dtype round-trip: fwd consumes exactly what bwd will read back
    x = x.astype(x0_ref.dtype)
    x0_ref[:] = x
    h = x.astype(jnp.float32)
    D = h.shape[1]

    # ---- T-layer residual-writing forward (same body as _stored_fwd_kernel)
    mm = jnp.bfloat16 if x0_ref.dtype == jnp.bfloat16 else jnp.float32
    for t in range(T):
        if t > 0:
            saved_refs[t - 1][:] = h.astype(saved_refs[t - 1].dtype)
        if rate > 0.0:
            _seed_layer(seed_ref, i, t, T)
        h, r = _layer_fwd(h, _params_at(param_refs, t, stored), S=S,
                          rate=rate, slot0_only=(t == T - 1),
                          want_residuals=True, mm_dtype=mm)
        qkv_refs[t][:] = jnp.concatenate(
            [r["q"], r["k"], r["v"]], axis=1
        ).astype(qkv_refs[t].dtype)
        smg_refs[t][:] = _pack_smg(r, D).astype(smg_refs[t].dtype)
        h_refs[t][:] = r["h"].astype(h_refs[t].dtype)
    out_ref[:] = h.astype(out_ref.dtype)


def _sampled_stored_fwd_call(tag_rows, deg, self_tag, codebook, params,
                             seed, S, T, rate, tile_target, x_dtype,
                             interpret):
    from graph_transformer_tpu.ops.pallas_sampled_encoder import _full_spec2
    from graph_transformer_tpu.sampling.pallas_sampler import TABLE_WIDTH

    stored = params[0].shape[0]
    D = params[0].shape[1]
    F = params[6].shape[2]
    R = tile_rows(S, tile_target)
    G = R // S
    n = tag_rows.shape[0]
    n_pad = ((n + G - 1) // G) * G
    if n_pad != n:
        pad = n_pad - n
        tag_rows = jnp.pad(tag_rows, ((0, pad), (0, 0)))
        deg = jnp.pad(deg, ((0, pad), (0, 0)), constant_values=1)
        self_tag = jnp.pad(self_tag, ((0, pad), (0, 0)))
    rows_pad = n_pad * S
    grid = (n_pad // G,)
    param_specs, _ = _stacked_param_specs(stored, D, F)
    n_saved = max(T - 1, 0)
    smw = _smg_width(D)

    def rows_t(t):
        return (n_pad, G) if t == T - 1 else (rows_pad, R)

    out_specs = (
        [pl.BlockSpec((G, D), lambda i: (i, 0)),       # slot-0 out
         pl.BlockSpec((R, D), lambda i: (i, 0))]       # built x0
        + [pl.BlockSpec((R, D), lambda i: (i, 0)) for _ in range(n_saved)]
        + [pl.BlockSpec((R, 3 * D), lambda i: (i, 0)) for _ in range(T)]
        + [pl.BlockSpec((rows_t(t)[1], smw), lambda i: (i, 0))
           for t in range(T)]
        + [pl.BlockSpec((rows_t(t)[1], F), lambda i: (i, 0))
           for t in range(T)]
    )
    out_shape = (
        [jax.ShapeDtypeStruct((n_pad, D), jnp.float32),
         jax.ShapeDtypeStruct((rows_pad, D), x_dtype)]
        + [jax.ShapeDtypeStruct((rows_pad, D), x_dtype)
           for _ in range(n_saved)]
        + [jax.ShapeDtypeStruct((rows_pad, 3 * D), jnp.float32)
           for _ in range(T)]
        + [jax.ShapeDtypeStruct((rows_t(t)[0], smw), jnp.float32)
           for t in range(T)]
        + [jax.ShapeDtypeStruct((rows_t(t)[0], F), x_dtype)
           for t in range(T)]
    )
    outs = pl.pallas_call(
        functools.partial(_sampled_stored_fwd_kernel, S=S, rate=rate, T=T,
                          stored=stored),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0)),
                  pl.BlockSpec((G, TABLE_WIDTH), lambda i: (i, 0)),
                  pl.BlockSpec((G, 1), lambda i: (i, 0)),
                  pl.BlockSpec((G, 1), lambda i: (i, 0)),
                  _full_spec2(codebook.shape)] + param_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(_seed_arr(seed), tag_rows, deg, self_tag, codebook, *params)
    out, x0 = outs[0], outs[1]
    saved = tuple(outs[2:2 + n_saved])
    qkvs = tuple(outs[2 + n_saved:2 + n_saved + T])
    smgs = tuple(outs[2 + n_saved + T:2 + n_saved + 2 * T])
    hs = tuple(outs[2 + n_saved + 2 * T:])
    return out[:n], x0, saved, qkvs, smgs, hs


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def fused_u2gnn_encoder_sampled_stored(tag_rows, deg, self_tag, codebook,
                                       params, seed, seq_len: int,
                                       num_timesteps: int, rate: float = 0.0,
                                       tile_target: int = 384,
                                       interpret: bool = False):
    """``fused_u2gnn_encoder_sampled`` (sample + build codebook features +
    T-layer encoder in one kernel) with the stored-residual backward.
    Default ``tile_target=384``: the residual writes put the 512-row tile
    over the 16 MB scoped-VMEM limit, and 384 measured faster than 512
    under a raised limit anyway (scripts/bench_stored_bwd.py)."""
    out, _, _, _, _, _ = _sampled_stored_fwd_call(
        tag_rows, deg, self_tag, codebook, params, seed, seq_len,
        num_timesteps, rate, tile_target, jnp.bfloat16, interpret,
    )
    return out


def _sampled_stored_fwd_rule(tag_rows, deg, self_tag, codebook, params,
                             seed, S, T, rate, tile_target, interpret):
    out, x0, saved, qkvs, smgs, hs = _sampled_stored_fwd_call(
        tag_rows, deg, self_tag, codebook, params, seed, S, T, rate,
        tile_target, jnp.bfloat16, interpret,
    )
    shapes = (tag_rows.shape, deg.shape, self_tag.shape)
    return out, (x0, params, seed, saved, qkvs, smgs, hs, shapes,
                 codebook.shape)


def _sampled_stored_bwd_rule(S, T, rate, tile_target, interpret, res, dout):
    x0, params, seed, saved, qkvs, smgs, hs, shapes, code_shape = res
    R = tile_rows(S, tile_target)
    G = R // S
    g, _ = _pad_rows(dout.astype(jnp.float32), G)
    _, dparams = _stored_bwd_core(x0, params, seed, saved, qkvs, smgs, hs,
                                  g, S=S, T=T, rate=rate, R=R,
                                  interpret=interpret)
    # int inputs take float0 cotangents; the codebook is dataset constants
    ct_int = lambda s: np.zeros(s, jax.dtypes.float0)
    return (ct_int(shapes[0]), ct_int(shapes[1]), ct_int(shapes[2]),
            jnp.zeros(code_shape, jnp.float32), dparams,
            np.zeros(np.shape(seed), jax.dtypes.float0))


fused_u2gnn_encoder_sampled_stored.defvjp(_sampled_stored_fwd_rule,
                                          _sampled_stored_bwd_rule)
