"""Folded-lane [G, S·D] encoder layer — the round-4 "last structural idea",
prototyped and measured (BASELINE.md round-4; VERDICT r4 item 7).

Why: at the U2GNN shapes (S=9 neighborhood, D=4 features) the current
per-layer kernel computes attention DENSE over the row axis — scores is
[R, R] with R ≈ 504, of which only the 9-wide diagonal blocks matter
(56× redundant work), at 4/128 lane occupancy for every glue op.  Folding
each neighborhood into ONE row of S·D = 36 lanes turns every per-slot op
into a constant-matrix MXU contraction at 36–81/128 lane occupancy and
shrinks the attention tensors 56×:

    q,k,v  [G, 36]   = x @ blockdiag(w)          (kron(I_S, w))
    scores [G, 81]   = (q@E_q ⊙ k@E_k) @ R_s     (expand-multiply-reduce)
    softmax          = global row max + exp + block-sum matmul (B_sum)
    ctx    [G, 36]   = (attn@A_e ⊙ v@E_k) @ R_c
    LN               = block-mean matmul (M_mean) + rsqrt, all in-lane
    FFN    [G, S·F]  = y1 @ blockdiag(w1)        (inflated 9×, but the 9×
                       lane-packing gain cancels it — measured-neutral;
                       pre-chunked over the hidden lanes for VMEM)
    last layer       = slot0-only: scores [G, S], single-block softmax,
                       ctx [G, D], raw [D, F] FFN — S× less work for the
                       one row that is consumed (its backward is a
                       dedicated [G, D]-space kernel)

The expand/reduce selector matrices are 0/1 constants built once on the
host; every op is either an MXU contraction or a [G, ≤324]-lane VPU op.
Numerics: softmax subtracts the GLOBAL row max (a per-row constant is
exact for every 9-block's softmax); LN uses the same eps as the row-space
kernel.  Dropout shapes differ from the row-space kernel ([G, 81] vs
[R, R] etc.), so rate>0 runs are a different (equally valid) PRNG stream.

Measured A/B (scripts/bench_folded.py -> runs/folded_ab.json): encoder
grad loop at bench shapes 7.53 (row-space stored) -> 3.83 ms/step;
bench.py 3.76M -> 8.1M edges/s/chip across round 5.  CV accuracy gate:
MUTAG 10-fold gap vs XLA-f32 = 0.0000 (runs/hybrid_parity_r3.json
'+folded').  Shape gate: ``folded_shape_ok`` (selector constants scale
as S²·D); the row-space stored path is the fallback.
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

from graph_transformer_tpu.ops.pallas_ffn import (
    _dropout_mask,
    _seed_arr,
)
from graph_transformer_tpu.ops.pallas_u2gnn import _EPS

__all__ = ["fold_rows", "folded_selectors", "folded_shape_ok",
           "folded_u2gnn_encoder", "folded_u2gnn_encoder_grad",
           "folded_u2gnn_encoder_sampled", "unfold_rows"]

# The [Gt, S·F] FFN tensors are the VMEM budget (S·F = 9216 at bench
# shapes): process the hidden dimension in chunks.  Dropout draws one
# mask per chunk, in chunk order, in BOTH fwd and bwd — the canonical
# draw order per layer is (attn, a, h-chunk 0..n-1, z).  The count is a
# pure function of the folded width so fwd and bwd always agree.


def _ffn_chunks(S: int, D: int) -> int:
    """Slot-aligned chunk count (must divide S): the kernels CONSTRUCT
    each chunk's blockdiag from the raw [D, F] weight in-kernel
    (tile + iota mask — measured bit-exact on chip, vmap-safe), so a
    chunk must cover whole slots."""
    for c in (3, 2):
        if S % c == 0:
            return c
    return 1


def folded_shape_ok(S: int, D: int) -> bool:
    """Applicability gate: the selector constants scale as
    (S·S·D)·max(S·D, S·S) — fine at the TU/REDDIT shapes (S=9, D≤7:
    ≤0.9 MB of constants) but infeasible at e.g. K=16/D=19 (S·S·D = 5491
    lanes, ~34 MB).  Callers fall back to the row-space stored path."""
    return S * D <= 128 and S * S * D <= 1024


# --------------------------------------------------------- host constants
@functools.lru_cache(maxsize=8)
def folded_selectors(S: int, D: int):
    """The 0/1 selector matrices for one (S, D) shape, as numpy f32.

    Index convention: folded feature lane ``i*D + d`` (slot i, channel d);
    folded score lane ``i*S + j`` (query slot i, key slot j); expanded
    lane ``(i*S + j)*D + d``.
    """
    W, P, X = S * D, S * S, S * S * D
    e_q = np.zeros((W, X), np.float32)   # q[i,d] -> (i,j,d) for all j
    e_k = np.zeros((W, X), np.float32)   # k[j,d] -> (i,j,d) for all i
    r_s = np.zeros((X, P), np.float32)   # sum_d (i,j,d) -> (i,j)
    a_e = np.zeros((P, X), np.float32)   # attn[i,j] -> (i,j,d) for all d
    r_c = np.zeros((X, W), np.float32)   # sum_j (i,j,d) -> (i,d)
    for i in range(S):
        for j in range(S):
            for d in range(D):
                x = (i * S + j) * D + d
                e_q[i * D + d, x] = 1.0
                e_k[j * D + d, x] = 1.0
                r_s[x, i * S + j] = 1.0
                a_e[i * S + j, x] = 1.0
                r_c[x, i * D + d] = 1.0
    b_sum = np.kron(np.eye(S, dtype=np.float32),
                    np.ones((S, S), np.float32))      # [P, P] block sum
    m_mean = np.kron(np.eye(S, dtype=np.float32),
                     np.full((D, D), 1.0 / D, np.float32))  # [W, W]
    return e_q, e_k, r_s, a_e, r_c, b_sum, m_mean


@functools.lru_cache(maxsize=8)
def folded_slot0_selectors(S: int, D: int):
    """Selectors for the slot0-only LAST layer: only the slot-0 row's
    output is consumed, so the last layer computes S× less — scores
    [G, S], ctx [G, D], FFN in raw [D, F] space."""
    W = S * D
    e_q0 = np.zeros((W, W), np.float32)   # q[0,d] -> (j,d) for all j
    r_s0 = np.zeros((W, S), np.float32)   # sum_d (j,d) -> j
    a0 = np.zeros((S, W), np.float32)     # attn0[j] -> (j,d) for all d
    r_c0 = np.zeros((W, D), np.float32)   # sum_j (j,d) -> d
    p0 = np.zeros((W, D), np.float32)     # slot-0 lane extractor
    for j in range(S):
        for d in range(D):
            e_q0[d, j * D + d] = 1.0
            r_s0[j * D + d, j] = 1.0
            a0[j, j * D + d] = 1.0
            r_c0[j * D + d, d] = 1.0
    for d in range(D):
        p0[d, d] = 1.0
    return e_q0, r_s0, a0, r_c0, p0


def fold_rows(x2d: jax.Array, S: int) -> jax.Array:
    """[G·S, D] row-space -> [G, S·D] folded (host/XLA-side relayout)."""
    R, D = x2d.shape
    return x2d.reshape(R // S, S * D)


def unfold_rows(xf: jax.Array, S: int) -> jax.Array:
    """[G, S·D] folded -> [G·S, D] row-space."""
    G, W = xf.shape
    return xf.reshape(G * S, W // S)


def _bd(w, S):
    """blockdiag: kron(I_S, w) — [S·a, S·b] from [a, b]."""
    return jnp.kron(jnp.eye(S, dtype=w.dtype), w)


def _tile(b, S):
    # (1, S·len) — 2-D so the fold-vmapped runners can batch the spec
    # (1-D full blocks fail Pallas lowering under a vmapped leading dim)
    return jnp.tile(b, S).reshape(1, -1)


def _ln_folded(u, m_mean, g_t, b_t):
    """LayerNorm over each D-block of the folded lanes: M_mean both
    computes and broadcasts the block mean."""
    mu = jnp.dot(u, m_mean, preferred_element_type=jnp.float32)
    d = u - mu
    var = jnp.dot(d * d, m_mean, preferred_element_type=jnp.float32)
    rstd = jax.lax.rsqrt(var + _EPS)
    return d * rstd * g_t + b_t


def _folded_layer_fwd(x, c, p, *, S, D, rate, mm):
    """One encoder layer over a folded [Gt, S·D] tile."""
    keep = 1.0 - rate
    e_q, e_k, r_s, a_e, r_c, b_sum, m_mean = c
    ((bd_q, bd_k, bd_v, bq_t, bk_t, bv_t, bd_o, bo_t, g1_t, b1_t),
     w1_raw, b1_row, w2_raw, bf2_t, g2_t, b2_t) = _unpack_folded_params(p)

    q = jnp.dot(x.astype(mm), bd_q.astype(mm),
                preferred_element_type=jnp.float32) + bq_t
    k = jnp.dot(x.astype(mm), bd_k.astype(mm),
                preferred_element_type=jnp.float32) + bk_t
    v = jnp.dot(x.astype(mm), bd_v.astype(mm),
                preferred_element_type=jnp.float32) + bv_t
    qe = jnp.dot(q.astype(mm), e_q.astype(mm),
                 preferred_element_type=jnp.float32)
    ke = jnp.dot(k.astype(mm), e_k.astype(mm),
                 preferred_element_type=jnp.float32)
    s = jnp.dot((qe * ke).astype(mm), r_s.astype(mm),
                preferred_element_type=jnp.float32) * (1.0 / math.sqrt(D))
    # softmax per 9-block: subtracting the GLOBAL row max is exact for
    # every block (any per-row constant cancels in the block's ratio)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.dot(e, b_sum, preferred_element_type=jnp.float32)
    attn = e / denom
    if rate > 0.0:
        attn = attn * _dropout_mask(attn.shape, rate) / keep
    ae = jnp.dot(attn.astype(mm), a_e.astype(mm),
                 preferred_element_type=jnp.float32)
    ve = jnp.dot(v.astype(mm), e_k.astype(mm),
                 preferred_element_type=jnp.float32)
    ctx = jnp.dot((ae * ve).astype(mm), r_c.astype(mm),
                  preferred_element_type=jnp.float32)
    a = jnp.dot(ctx.astype(mm), bd_o.astype(mm),
                preferred_element_type=jnp.float32) + bo_t
    if rate > 0.0:
        a = a * _dropout_mask(a.shape, rate) / keep
    y1 = _ln_folded(x.astype(jnp.float32) + a, m_mean, g1_t, b1_t)
    z = _ffn_folded(y1, w1_raw, b1_row, w2_raw, bf2_t, rate, mm, S)
    if rate > 0.0:
        z = z * _dropout_mask(z.shape, rate) / keep
    return _ln_folded(y1 + z, m_mean, g2_t, b2_t)


def _ffn_folded(y1, w1_raw, b1_row, w2_raw, bf2_t, rate, mm, S):
    """relu-FFN over slot-aligned hidden chunks; each chunk's blockdiag
    weight constructs in-kernel from the raw [D, F] weight (one dropout
    draw per chunk, chunk order)."""
    keep = 1.0 - rate
    C = _ffn_chunks(S, y1.shape[1] // S)
    y1m = y1.astype(mm)
    z = None
    for c in range(C):
        h = jnp.maximum(
            jnp.dot(y1m, _bd_chunk_w1(w1_raw, S, C, c, mm),
                    preferred_element_type=jnp.float32)
            + _b1_chunk(b1_row, S, C, c), 0.0)
        if rate > 0.0:
            h = h * _dropout_mask(h.shape, rate) / keep
        zc = jnp.dot(h.astype(mm), _bd_chunk_w2(w2_raw, S, C, c, mm),
                     preferred_element_type=jnp.float32)
        z = zc if z is None else z + zc
    return z + bf2_t


def _fold_params(params, t, stored, S):
    """Per-layer folded parameter set from the stacked 12-tuple.

    Layout (n_p = 13 + 3·FFN_CHUNKS): 10 attention/LN1 tensors, then the
    FFN tensors PRE-CHUNKED over the hidden lanes (the kernels never
    lane-slice values — Mosaic rejects that under a vmapped leading dim),
    then (bf2, ln2 scale, ln2 bias).
    """
    (w_in, b_in, w_out, b_out, ln1g, ln1b, w1, b1, w2, b2, ln2g,
     ln2b) = [a[t % stored] for a in params]
    D = w_in.shape[0]
    wq, wk, wv = w_in[:, :D], w_in[:, D:2 * D], w_in[:, 2 * D:]
    bq, bk, bv = b_in[:D], b_in[D:2 * D], b_in[2 * D:]
    return (
        _bd(wq, S), _bd(wk, S), _bd(wv, S),
        _tile(bq, S), _tile(bk, S), _tile(bv, S),
        _bd(w_out, S), _tile(b_out, S),
        _tile(ln1g, S), _tile(ln1b, S),
        w1, b1.reshape(1, -1), w2,
        _tile(b2, S), _tile(ln2g, S), _tile(ln2b, S),
    )


def _slot0_extras(params, t, stored):
    """Raw (unfolded) weights the slot0 last layer needs: w_out [D, D],
    w1 [D, F], b1 [1, F], w2 [F, D].  (Shared LN scales/biases and the
    remaining biases are recovered in-kernel from the tiled forms via
    the p0 extractor.)"""
    (w_in, b_in, w_out, b_out, ln1g, ln1b, w1, b1, w2, b2, ln2g,
     ln2b) = [a[t % stored] for a in params]
    return (w_out, w1, b1.reshape(1, -1), w2)


def _ln_lanes(u, g, b):
    """Plain LayerNorm over the last (D-lane) axis with residuals."""
    mu = jnp.mean(u, axis=-1, keepdims=True)
    d = u - mu
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _EPS)
    uhat = d * rstd
    return uhat * g + b, uhat, rstd


def _folded_layer_fwd_slot0(x, c, c0, p, extras, *, S, D, rate, mm,
                            want_res):
    """Slot0-only LAST layer over a folded [Gt, S·D] tile -> [Gt, D].
    PRNG draw order: (attn0 [G,S], a [G,D], h [G,F], z [G,D])."""
    keep = 1.0 - rate
    e_q, e_k, r_s, a_e, r_c, b_sum, m_mean = c
    e_q0, r_s0, a0_sel, r_c0, p0 = c0
    ((bd_q, bd_k, bd_v, bq_t, bk_t, bv_t, bd_o, bo_t, g1_t, b1_t),
     w1_raw, b1_row, w2_raw, bf2_t, g2_t, b2_t) = _unpack_folded_params(p)
    w_out_raw, w1_raw, b1_raw, w2_raw = extras

    q = jnp.dot(x.astype(mm), bd_q.astype(mm),
                preferred_element_type=jnp.float32) + bq_t
    k = jnp.dot(x.astype(mm), bd_k.astype(mm),
                preferred_element_type=jnp.float32) + bk_t
    v = jnp.dot(x.astype(mm), bd_v.astype(mm),
                preferred_element_type=jnp.float32) + bv_t
    q0e = jnp.dot(q.astype(mm), e_q0.astype(mm),
                  preferred_element_type=jnp.float32)
    s0 = jnp.dot((q0e * k).astype(mm), r_s0.astype(mm),
                 preferred_element_type=jnp.float32) * (1.0 / math.sqrt(D))
    m = jnp.max(s0, axis=-1, keepdims=True)
    e = jnp.exp(s0 - m)
    attn0 = e / jnp.sum(e, axis=-1, keepdims=True)  # [G, S], one block
    attn0_d = (attn0 * _dropout_mask(attn0.shape, rate) / keep
               if rate > 0.0 else attn0)
    av = jnp.dot(attn0_d.astype(mm), a0_sel.astype(mm),
                 preferred_element_type=jnp.float32) * v
    ctx0 = jnp.dot(av.astype(mm), r_c0.astype(mm),
                   preferred_element_type=jnp.float32)  # [G, D]
    a = jnp.dot(ctx0.astype(mm), w_out_raw.astype(mm),
                preferred_element_type=jnp.float32)         + jnp.dot(bo_t, p0, preferred_element_type=jnp.float32)
    if rate > 0.0:
        a = a * _dropout_mask(a.shape, rate) / keep
    x0 = jnp.dot(x.astype(jnp.float32), p0,
                 preferred_element_type=jnp.float32)
    g1_0 = jnp.dot(g1_t, p0, preferred_element_type=jnp.float32)
    b1_0 = jnp.dot(b1_t, p0, preferred_element_type=jnp.float32)
    y1, uhat1, rstd1 = _ln_lanes(x0 + a, g1_0, b1_0)
    hpre = jnp.dot(y1.astype(mm), w1_raw.astype(mm),
                   preferred_element_type=jnp.float32) + b1_raw
    h = jnp.maximum(hpre, 0.0)
    if rate > 0.0:
        h = h * _dropout_mask(h.shape, rate) / keep
    z = jnp.dot(h.astype(mm), w2_raw.astype(mm),
                preferred_element_type=jnp.float32)         + jnp.dot(bf2_t, p0, preferred_element_type=jnp.float32)
    if rate > 0.0:
        z = z * _dropout_mask(z.shape, rate) / keep
    g2_0 = jnp.dot(g2_t, p0, preferred_element_type=jnp.float32)
    b2_0 = jnp.dot(b2_t, p0, preferred_element_type=jnp.float32)
    out, uhat2, rstd2 = _ln_lanes(y1 + z, g2_0, b2_0)
    if not want_res:
        return out, None
    ones_d = jnp.ones((1, D), jnp.float32)
    res = dict(qkv=jnp.concatenate([q, k, v], axis=1), attn0=attn0,
               strip=jnp.concatenate(
                   [ctx0, y1, uhat1, uhat2,
                    rstd1 * ones_d, rstd2 * ones_d], axis=1))
    return out, res


def _unpack_folded_params(p):
    base = p[:10]
    w1_raw, b1_row, w2_raw = p[10:13]
    bf2_t, g2_t, b2_t = p[13:16]
    return base, w1_raw, b1_row, w2_raw, bf2_t, g2_t, b2_t


def _bd_chunk_w1(w1, S, C, c, mm):
    """Construct chunk ``c`` of kron(I_S, w1) in-kernel: output lanes for
    slots [c·S/C, (c+1)·S/C), shape [S·D, (S/C)·F]."""
    D, F = w1.shape
    sc = S // C
    wt = jnp.tile(w1, (S, sc)).astype(mm)          # [S·D, sc·F]
    r = jax.lax.broadcasted_iota(jnp.int32, wt.shape, 0) // D
    col = jax.lax.broadcasted_iota(jnp.int32, wt.shape, 1) // F
    return jnp.where(r == c * sc + col, wt, 0)


def _bd_chunk_w2(w2, S, C, c, mm):
    """Chunk ``c`` of kron(I_S, w2): input rows for the same slot range,
    shape [(S/C)·F, S·D]."""
    F, D = w2.shape
    sc = S // C
    wt = jnp.tile(w2, (sc, S)).astype(mm)          # [sc·F, S·D]
    r = jax.lax.broadcasted_iota(jnp.int32, wt.shape, 0) // F
    col = jax.lax.broadcasted_iota(jnp.int32, wt.shape, 1) // D
    return jnp.where(c * sc + r == col, wt, 0)


def _b1_chunk(b1_row, S, C, c):
    """Chunk ``c`` of tile(b1, S): [1, (S/C)·F] (all slots share b1)."""
    return jnp.tile(b1_row, (1, S // C))


def _folded_kernel(seed_ref, x_ref, *refs, S, D, T, rate, n_const, n_p):
    const = tuple(r[:] for r in refs[:n_const])
    c0 = tuple(r[:] for r in refs[n_const:n_const + 5])
    k0 = n_const + 5 + T * n_p
    extras = tuple(r[:] for r in refs[k0:k0 + 4])
    out_ref = refs[k0 + 4]
    mm = jnp.bfloat16
    h = x_ref[:].astype(jnp.float32)
    i = pl.program_id(0)
    for t in range(T):
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0, 0] + t * pl.num_programs(0) + i)
        p = tuple(r[:] for r in refs[n_const + 5 + t * n_p:
                                     n_const + 5 + (t + 1) * n_p])
        if t == T - 1:
            h, _ = _folded_layer_fwd_slot0(h, const, c0, p, extras, S=S,
                                           D=D, rate=rate, mm=mm,
                                           want_res=False)
        else:
            h = _folded_layer_fwd(h, const, p, S=S, D=D, rate=rate, mm=mm)
    out_ref[:] = h.astype(out_ref.dtype)  # [Gt, D] slot-0 output


def folded_u2gnn_encoder(x2d, params, seed, seq_len: int,
                         num_timesteps: int, rate: float = 0.0,
                         tile_g: int = 128, interpret: bool = False):
    """Forward-only folded-lane twin of ``fused_u2gnn_encoder``:
    same [N·S, D] -> [N, D] (slot-0) contract, internally [G, S·D]."""
    S, T, D = seq_len, num_timesteps, x2d.shape[1]
    stored = params[0].shape[0]
    consts = tuple(jnp.asarray(c) for c in folded_selectors(S, D))
    layer_ps = [_fold_params(params, t, stored, S) for t in range(T)]
    n_p = len(layer_ps[0])
    xf = fold_rows(x2d.astype(jnp.bfloat16), S)
    G = xf.shape[0]
    g_pad = ((G + tile_g - 1) // tile_g) * tile_g
    if g_pad != G:
        xf = jnp.pad(xf, ((0, g_pad - G), (0, 0)))
    grid = (g_pad // tile_g,)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)

    c0 = tuple(jnp.asarray(c) for c in folded_slot0_selectors(S, D))
    extras = _slot0_extras(params, T - 1, stored)
    flat_p = [a for lp in layer_ps for a in lp]
    out = pl.pallas_call(
        functools.partial(_folded_kernel, S=S, D=D, T=T, rate=rate,
                          n_const=len(consts), n_p=n_p),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0)),
                  pl.BlockSpec((tile_g, S * D), lambda i: (i, 0))]
        + [full(c) for c in consts] + [full(c) for c in c0]
        + [full(a) for a in flat_p] + [full(a) for a in extras],
        out_specs=pl.BlockSpec((tile_g, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((g_pad, D), jnp.float32),
        interpret=interpret,
    )(_seed_arr(seed), xf, *consts, *c0, *flat_p, *extras)
    return out[:G]


# ===================================================== stored-residual bwd
def _ln_folded_res(u, m_mean, g_t, b_t):
    """LN with residuals: (out, uhat, rstd_expanded)."""
    mu = jnp.dot(u, m_mean, preferred_element_type=jnp.float32)
    d = u - mu
    var = jnp.dot(d * d, m_mean, preferred_element_type=jnp.float32)
    rstd = jax.lax.rsqrt(var + _EPS)  # [Gt, W], block-constant
    uhat = d * rstd
    return uhat * g_t + b_t, uhat, rstd


def _folded_layer_fwd_res(x, c, p, *, S, D, rate, mm):
    """Residual-emitting twin of :func:`_folded_layer_fwd` (same PRNG
    draw order: attn, a, h, z)."""
    keep = 1.0 - rate
    e_q, e_k, r_s, a_e, r_c, b_sum, m_mean = c
    ((bd_q, bd_k, bd_v, bq_t, bk_t, bv_t, bd_o, bo_t, g1_t, b1_t),
     w1_raw, b1_row, w2_raw, bf2_t, g2_t, b2_t) = _unpack_folded_params(p)

    q = jnp.dot(x.astype(mm), bd_q.astype(mm),
                preferred_element_type=jnp.float32) + bq_t
    k = jnp.dot(x.astype(mm), bd_k.astype(mm),
                preferred_element_type=jnp.float32) + bk_t
    v = jnp.dot(x.astype(mm), bd_v.astype(mm),
                preferred_element_type=jnp.float32) + bv_t
    qe = jnp.dot(q.astype(mm), e_q.astype(mm),
                 preferred_element_type=jnp.float32)
    ke = jnp.dot(k.astype(mm), e_k.astype(mm),
                 preferred_element_type=jnp.float32)
    s = jnp.dot((qe * ke).astype(mm), r_s.astype(mm),
                preferred_element_type=jnp.float32) * (1.0 / math.sqrt(D))
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.dot(e, b_sum, preferred_element_type=jnp.float32)
    attn = e / denom
    attn_d = (attn * _dropout_mask(attn.shape, rate) / keep
              if rate > 0.0 else attn)
    ae = jnp.dot(attn_d.astype(mm), a_e.astype(mm),
                 preferred_element_type=jnp.float32)
    ve = jnp.dot(v.astype(mm), e_k.astype(mm),
                 preferred_element_type=jnp.float32)
    ctx = jnp.dot((ae * ve).astype(mm), r_c.astype(mm),
                  preferred_element_type=jnp.float32)
    a = jnp.dot(ctx.astype(mm), bd_o.astype(mm),
                preferred_element_type=jnp.float32) + bo_t
    if rate > 0.0:
        a = a * _dropout_mask(a.shape, rate) / keep
    y1, uhat1, rstd1 = _ln_folded_res(x.astype(jnp.float32) + a, m_mean,
                                      g1_t, b1_t)
    z = _ffn_folded(y1, w1_raw, b1_row, w2_raw, bf2_t, rate, mm, S)
    if rate > 0.0:
        z = z * _dropout_mask(z.shape, rate) / keep
    out, uhat2, rstd2 = _ln_folded_res(y1 + z, m_mean, g2_t, b2_t)
    res = dict(qkv=jnp.concatenate([q, k, v], axis=1), attn=attn,
               strip=jnp.concatenate(
                   [ctx, y1, uhat1, uhat2, rstd1, rstd2], axis=1))
    return out, res


def _folded_stored_fwd_kernel(seed_ref, x_ref, *refs, S, D, T, rate,
                              n_const, n_p):
    const = tuple(r[:] for r in refs[:n_const])
    c0 = tuple(r[:] for r in refs[n_const:n_const + 5])
    n_saved = max(T - 1, 0)
    kp = n_const + 5
    k0 = kp + T * n_p
    extras = tuple(r[:] for r in refs[k0:k0 + 4])
    out_ref = refs[k0 + 4]
    saved_refs = refs[k0 + 5:k0 + 5 + n_saved]
    qkv_refs = refs[k0 + 5 + n_saved:k0 + 5 + n_saved + T]
    attn_refs = refs[k0 + 5 + n_saved + T:k0 + 5 + n_saved + 2 * T]
    strip_refs = refs[k0 + 5 + n_saved + 2 * T:]
    mm = jnp.bfloat16
    h = x_ref[:].astype(jnp.float32)
    i = pl.program_id(0)
    for t in range(T):
        if t > 0:
            saved_refs[t - 1][:] = h.astype(saved_refs[t - 1].dtype)
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0, 0] + t * pl.num_programs(0) + i)
        p = tuple(r[:] for r in refs[kp + t * n_p:kp + (t + 1) * n_p])
        if t == T - 1:
            h, res = _folded_layer_fwd_slot0(h, const, c0, p, extras,
                                             S=S, D=D, rate=rate, mm=mm,
                                             want_res=True)
            attn_refs[t][:] = res["attn0"]
        else:
            h, res = _folded_layer_fwd_res(h, const, p, S=S, D=D,
                                           rate=rate, mm=mm)
            attn_refs[t][:] = res["attn"]
        qkv_refs[t][:] = res["qkv"].astype(qkv_refs[t].dtype)
        strip_refs[t][:] = res["strip"]
    out_ref[:] = h.astype(out_ref.dtype)  # [Gt, D] slot-0 output


def _folded_bwd_kernel(seed_ref, x_ref, qkv_ref, attn_ref, strip_ref,
                       g_ref, *refs, S, D, F, rate, t_stream):
    """Backward of one folded layer from stored residuals; the FFN hidden
    is the only recompute (one matmul) and dropout masks replay from the
    layer's PRNG stream in the forward's draw order."""
    n_p = 18  # 16 folded params + (w1ᵀ, w2ᵀ) appended by the call
    p = tuple(r[:] for r in refs[:16])
    w1_T, w2_T = refs[16][:], refs[17][:]
    c = tuple(r[:] for r in refs[n_p:n_p + 7])
    dx_ref = refs[n_p + 7]
    grad_refs = refs[n_p + 8:]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for ref in grad_refs:
            ref[:] = jnp.zeros_like(ref)

    ((bd_q, bd_k, bd_v, bq_t, bk_t, bv_t, bd_o, bo_t, g1_t, b1_t),
     w1_raw, b1_row, w2_raw, bf2_t, g2_t, b2_t) = _unpack_folded_params(p)
    e_q, e_k, r_s, a_e, r_c, b_sum, m_mean = c
    mm = jnp.bfloat16
    keep = 1.0 - rate
    W = S * D
    x = x_ref[:].astype(jnp.float32)
    qkv = qkv_ref[:].astype(jnp.float32)
    q, k, v = qkv[:, :W], qkv[:, W:2 * W], qkv[:, 2 * W:]
    attn = attn_ref[:]
    st = strip_ref[:]
    ctx, y1, uhat1, uhat2, rstd1, rstd2 = (
        st[:, 0:W], st[:, W:2 * W], st[:, 2 * W:3 * W],
        st[:, 3 * W:4 * W], st[:, 4 * W:5 * W], st[:, 5 * W:6 * W])
    g = g_ref[:].astype(jnp.float32)

    n_ch = _ffn_chunks(S, D)
    hc_w = (S * F) // n_ch
    # replay the layer's dropout masks (fwd order: attn, a, h-chunks, z)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + t_stream + i)
        m_attn = _dropout_mask(attn.shape, rate)
        m_a = _dropout_mask((x.shape[0], W), rate)
        m_hs = [_dropout_mask((x.shape[0], hc_w), rate).astype(mm)
                for _ in range(n_ch)]
        m_z = _dropout_mask((x.shape[0], W), rate)

    def mmean(u):
        return jnp.dot(u, m_mean, preferred_element_type=jnp.float32)

    def dotT_acc(a_act, b_grad):  # aᵀ @ b without explicit transpose
        return jax.lax.dot_general(
            a_act.astype(mm), b_grad.astype(mm), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    # grad_refs layout mirrors _fold_params: 0-9 attention/LN1, then
    # per-chunk [10+c]=bd_w1_c, [10+C+c]=bf1_c, [10+2C+c]=bd_w2_c, then
    # [10+3C]=bf2, [+1]=g2, [+2]=b2
    C = n_ch
    # LN2 backward
    gg = g * g2_t
    du2 = (gg - mmean(gg) - uhat2 * mmean(gg * uhat2)) * rstd2
    grad_refs[12 + 3 * C][:] += jnp.sum(g, axis=0, keepdims=True)   # b2
    grad_refs[11 + 3 * C][:] += jnp.sum(
        g * uhat2, axis=0, keepdims=True)                           # g2
    # FFN backward over the pre-chunked hidden blocks (VMEM: recompute
    # each chunk's hidden from the stored y1; bf16 factors exact {0,2})
    dz = du2 * m_z / keep if rate > 0.0 else du2
    grad_refs[10 + 3 * C][:] += jnp.sum(dz, axis=0, keepdims=True)  # bf2
    dy1 = du2
    y1m = y1.astype(mm)
    dzm = dz.astype(mm)
    for cch in range(C):
        w1c = _bd_chunk_w1(w1_raw, S, C, cch, mm)      # [W, hc]
        hpre = jnp.dot(y1m, w1c,
                       preferred_element_type=jnp.float32) \
            + _b1_chunk(b1_row, S, C, cch)
        factor = (hpre > 0.0).astype(jnp.float32)
        if rate > 0.0:
            factor = factor * m_hs[cch].astype(jnp.float32) / keep
        factor = factor.astype(mm)
        h = (hpre * factor.astype(jnp.float32)).astype(mm)
        # w2 chunkᵀ = chunk of kron(I, w2ᵀ) (transposed-raw passed in)
        dh = jnp.dot(dzm, _bd_chunk_w1(w2_T, S, C, cch, mm),
                     preferred_element_type=jnp.float32).astype(mm)
        grad_refs[10 + 2 * C + cch][:] += dotT_acc(h, dz)           # bd_w2_c
        dhpre = dh * factor
        # w1 chunkᵀ = chunk of kron(I, w1ᵀ)
        dy1 = dy1 + jnp.dot(dhpre, _bd_chunk_w2(w1_T, S, C, cch, mm),
                            preferred_element_type=jnp.float32)
        grad_refs[10 + cch][:] += dotT_acc(y1, dhpre)               # bd_w1_c
        grad_refs[10 + C + cch][:] += jnp.sum(
            dhpre.astype(jnp.float32), axis=0, keepdims=True)       # bf1_c
    # LN1 backward
    gg1 = dy1 * g1_t
    du1 = (gg1 - mmean(gg1) - uhat1 * mmean(gg1 * uhat1)) * rstd1
    grad_refs[9][:] += jnp.sum(dy1, axis=0, keepdims=True)          # b1
    grad_refs[8][:] += jnp.sum(dy1 * uhat1, axis=0, keepdims=True)  # g1
    dx = du1
    da = du1 * m_a / keep if rate > 0.0 else du1
    dctx = jnp.dot(da.astype(mm), bd_o.astype(mm).T,
                   preferred_element_type=jnp.float32)
    grad_refs[6][:] += dotT_acc(ctx, da)                            # bd_o
    grad_refs[7][:] += jnp.sum(da, axis=0, keepdims=True)           # bo
    # ctx = (ae ⊙ ve) @ r_c
    attn_d = attn * m_attn / keep if rate > 0.0 else attn
    ae = jnp.dot(attn_d.astype(mm), a_e.astype(mm),
                 preferred_element_type=jnp.float32)
    ve = jnp.dot(v.astype(mm), e_k.astype(mm),
                 preferred_element_type=jnp.float32)
    dprod = jnp.dot(dctx.astype(mm), r_c.astype(mm).T,
                    preferred_element_type=jnp.float32)
    dattn_d = jnp.dot((dprod * ve).astype(mm), a_e.astype(mm).T,
                      preferred_element_type=jnp.float32)
    dv = jnp.dot((dprod * ae).astype(mm), e_k.astype(mm).T,
                 preferred_element_type=jnp.float32)
    dattn = dattn_d * m_attn / keep if rate > 0.0 else dattn_d
    # block softmax backward
    ds = attn * (dattn - jnp.dot(dattn * attn, b_sum,
                                 preferred_element_type=jnp.float32))
    ds = ds * (1.0 / math.sqrt(D))
    qe = jnp.dot(q.astype(mm), e_q.astype(mm),
                 preferred_element_type=jnp.float32)
    ke = jnp.dot(k.astype(mm), e_k.astype(mm),
                 preferred_element_type=jnp.float32)
    dprod_s = jnp.dot(ds.astype(mm), r_s.astype(mm).T,
                      preferred_element_type=jnp.float32)
    dq = jnp.dot((dprod_s * ke).astype(mm), e_q.astype(mm).T,
                 preferred_element_type=jnp.float32)
    dk = jnp.dot((dprod_s * qe).astype(mm), e_k.astype(mm).T,
                 preferred_element_type=jnp.float32)
    dx = (dx
          + jnp.dot(dq.astype(mm), bd_q.astype(mm).T,
                    preferred_element_type=jnp.float32)
          + jnp.dot(dk.astype(mm), bd_k.astype(mm).T,
                    preferred_element_type=jnp.float32)
          + jnp.dot(dv.astype(mm), bd_v.astype(mm).T,
                    preferred_element_type=jnp.float32))
    grad_refs[0][:] += dotT_acc(x, dq)                              # bd_q
    grad_refs[1][:] += dotT_acc(x, dk)                              # bd_k
    grad_refs[2][:] += dotT_acc(x, dv)                              # bd_v
    grad_refs[3][:] += jnp.sum(dq, axis=0, keepdims=True)
    grad_refs[4][:] += jnp.sum(dk, axis=0, keepdims=True)
    grad_refs[5][:] += jnp.sum(dv, axis=0, keepdims=True)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _folded_bwd0_kernel(seed_ref, x_ref, qkv_ref, attn0_ref, strip_ref,
                        g_ref, *refs, S, D, F, rate, t_stream):
    """Backward of the slot0-only LAST layer: dout [Gt, D] in, dx
    [Gt, S·D] out.  Draw order replay: (attn0, a, h, z)."""
    n_p = 16
    p = tuple(r[:] for r in refs[:n_p])
    c = tuple(r[:] for r in refs[n_p:n_p + 7])
    c0 = tuple(r[:] for r in refs[n_p + 7:n_p + 12])
    extras = tuple(r[:] for r in refs[n_p + 12:n_p + 16])
    dx_ref = refs[n_p + 16]
    grad_refs = refs[n_p + 17:]
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for ref in grad_refs:
            ref[:] = jnp.zeros_like(ref)

    ((bd_q, bd_k, bd_v, bq_t, bk_t, bv_t, bd_o, bo_t, g1_t, b1_t),
     w1_raw, b1_row, w2_raw, bf2_t, g2_t, b2_t) = _unpack_folded_params(p)
    e_q, e_k, r_s, a_e, r_c, b_sum, m_mean = c
    e_q0, r_s0, a0_sel, r_c0, p0 = c0
    w_out_raw, w1_raw, b1_raw, w2_raw = extras
    mm = jnp.bfloat16
    keep = 1.0 - rate
    W = S * D
    x = x_ref[:].astype(jnp.float32)
    qkv = qkv_ref[:].astype(jnp.float32)
    q, k, v = qkv[:, :W], qkv[:, W:2 * W], qkv[:, 2 * W:]
    attn0 = attn0_ref[:]
    st = strip_ref[:]
    ctx0, y1, uhat1, uhat2, rstd1, rstd2 = (
        st[:, 0:D], st[:, D:2 * D], st[:, 2 * D:3 * D],
        st[:, 3 * D:4 * D], st[:, 4 * D:5 * D], st[:, 5 * D:6 * D])
    g = g_ref[:].astype(jnp.float32)  # [Gt, D]

    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + t_stream + i)
        m_attn0 = _dropout_mask(attn0.shape, rate)
        m_a = _dropout_mask((x.shape[0], D), rate)
        m_h = _dropout_mask((x.shape[0], F), rate).astype(mm)
        m_z = _dropout_mask((x.shape[0], D), rate)

    def dotT_acc(a_act, b_grad):
        return jax.lax.dot_general(
            a_act.astype(mm), b_grad.astype(mm), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def ln_bwd(dout, uhat, rstd, gg_scale):
        gg = dout * gg_scale
        du = (gg - jnp.mean(gg, axis=-1, keepdims=True)
              - uhat * jnp.mean(gg * uhat, axis=-1, keepdims=True)) * rstd
        return du

    g1_0 = jnp.dot(g1_t, p0, preferred_element_type=jnp.float32)
    g2_0 = jnp.dot(g2_t, p0, preferred_element_type=jnp.float32)

    # LN2 bwd ([Gt, D] lanes)
    du2 = ln_bwd(g, uhat2, rstd2, g2_0)
    grad_refs[15][:] += jnp.sum(g, axis=0, keepdims=True)           # b2ln
    grad_refs[14][:] += jnp.sum(g * uhat2, axis=0, keepdims=True)   # g2ln
    # FFN bwd (raw [D, F] weights; hidden recomputed from stored y1)
    dz = du2 * m_z / keep if rate > 0.0 else du2
    grad_refs[13][:] += jnp.sum(dz, axis=0, keepdims=True)          # b2
    hpre = jnp.dot(y1.astype(mm), w1_raw.astype(mm),
                   preferred_element_type=jnp.float32) + b1_raw
    factor = (hpre > 0.0).astype(jnp.float32)
    if rate > 0.0:
        factor = factor * m_h.astype(jnp.float32) / keep
    factor = factor.astype(mm)
    h = (hpre * factor.astype(jnp.float32)).astype(mm)
    dh = jnp.dot(dz.astype(mm), w2_raw.astype(mm).T,
                 preferred_element_type=jnp.float32).astype(mm)
    grad_refs[12][:] += dotT_acc(h, dz)                             # w2
    dhpre = dh * factor
    dy1 = du2 + jnp.dot(dhpre, w1_raw.astype(mm).T,
                        preferred_element_type=jnp.float32)
    grad_refs[10][:] += dotT_acc(y1, dhpre)                         # w1
    grad_refs[11][:] += jnp.sum(
        dhpre.astype(jnp.float32), axis=0, keepdims=True)           # b1
    # LN1 bwd
    du1 = ln_bwd(dy1, uhat1, rstd1, g1_0)
    grad_refs[9][:] += jnp.sum(dy1, axis=0, keepdims=True)          # b1ln
    grad_refs[8][:] += jnp.sum(dy1 * uhat1, axis=0, keepdims=True)  # g1ln
    # residual: x0 = x @ p0 -> dx gets du1 placed at slot-0 lanes
    dx = jnp.dot(du1.astype(mm), p0.astype(mm).T,
                 preferred_element_type=jnp.float32)
    da = du1 * m_a / keep if rate > 0.0 else du1
    dctx0 = jnp.dot(da.astype(mm), w_out_raw.astype(mm).T,
                    preferred_element_type=jnp.float32)
    grad_refs[6][:] += dotT_acc(ctx0, da)                           # w_out
    grad_refs[7][:] += jnp.sum(da, axis=0, keepdims=True)           # b_out
    # ctx0 = (attn0_d @ a0 ⊙ v) @ r_c0
    attn0_d = attn0 * m_attn0 / keep if rate > 0.0 else attn0
    ae0 = jnp.dot(attn0_d.astype(mm), a0_sel.astype(mm),
                  preferred_element_type=jnp.float32)
    dav = jnp.dot(dctx0.astype(mm), r_c0.astype(mm).T,
                  preferred_element_type=jnp.float32)
    dattn0_d = jnp.dot((dav * v).astype(mm), a0_sel.astype(mm).T,
                       preferred_element_type=jnp.float32)
    dv = dav * ae0
    dattn0 = dattn0_d * m_attn0 / keep if rate > 0.0 else dattn0_d
    ds0 = attn0 * (dattn0 - jnp.sum(dattn0 * attn0, axis=-1,
                                    keepdims=True))
    ds0 = ds0 * (1.0 / math.sqrt(D))
    q0e = jnp.dot(q.astype(mm), e_q0.astype(mm),
                  preferred_element_type=jnp.float32)
    dprod = jnp.dot(ds0.astype(mm), r_s0.astype(mm).T,
                    preferred_element_type=jnp.float32)
    dq = jnp.dot((dprod * k).astype(mm), e_q0.astype(mm).T,
                 preferred_element_type=jnp.float32)
    dk = dprod * q0e
    dx = (dx
          + jnp.dot(dq.astype(mm), bd_q.astype(mm).T,
                    preferred_element_type=jnp.float32)
          + jnp.dot(dk.astype(mm), bd_k.astype(mm).T,
                    preferred_element_type=jnp.float32)
          + jnp.dot(dv.astype(mm), bd_v.astype(mm).T,
                    preferred_element_type=jnp.float32))
    grad_refs[0][:] += dotT_acc(x, dq)
    grad_refs[1][:] += dotT_acc(x, dk)
    grad_refs[2][:] += dotT_acc(x, dv)
    grad_refs[3][:] += jnp.sum(dq, axis=0, keepdims=True)
    grad_refs[4][:] += jnp.sum(dk, axis=0, keepdims=True)
    grad_refs[5][:] += jnp.sum(dv, axis=0, keepdims=True)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _grad_shapes_slot0(S, D, F):
    W = S * D
    return [(W, W), (W, W), (W, W), (1, W), (1, W), (1, W),
            (D, D), (1, D), (1, D), (1, D),
            (D, F), (1, F), (F, D), (1, D), (1, D), (1, D)]


def _reduce_slot0_grads(gs, S, D, F):
    """slot0-layer grads -> the layer's 12 true param grads (attention
    weights deblock; everything else is already raw)."""
    (dbd_q, dbd_k, dbd_v, dbq, dbk, dbv, dw_out, dbo, dg1, db1ln,
     dw1, db1, dw2, db2, dg2, db2ln) = gs

    def deblock(a, pdim, r):
        return jnp.einsum("ipir->pr", a.reshape(S, pdim, S, r))

    def detile(b, r):
        return b.reshape(S, r).sum(0)

    dw_in = jnp.concatenate(
        [deblock(dbd_q, D, D), deblock(dbd_k, D, D), deblock(dbd_v, D, D)],
        axis=1)
    db_in = jnp.concatenate(
        [detile(dbq, D), detile(dbk, D), detile(dbv, D)])
    return (dw_in, db_in, dw_out, dbo[0], dg1[0], db1ln[0],
            dw1, db1[0], dw2, db2[0], dg2[0], db2ln[0])


def _folded_bwd0_call(x_t, qkv, attn0, strip, g, layer_p, consts, c0,
                      extras, seed_arr, *, S, D, F, rate, t_stream,
                      tile_g, interpret):
    g_pad, W = x_t.shape
    grid = (g_pad // tile_g,)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)

    def rowspec(w):
        return pl.BlockSpec((tile_g, w), lambda i: (i, 0))

    gshapes = _grad_shapes_slot0(S, D, F)
    outs = pl.pallas_call(
        functools.partial(_folded_bwd0_kernel, S=S, D=D, F=F, rate=rate,
                          t_stream=t_stream),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0)),
                  rowspec(W), rowspec(3 * W), rowspec(S),
                  rowspec(6 * D), rowspec(D)]
        + [full(a) for a in layer_p] + [full(cc) for cc in consts]
        + [full(cc) for cc in c0] + [full(a) for a in extras],
        out_specs=[rowspec(W)] + [full(jnp.zeros(sh)) for sh in gshapes],
        out_shape=[jax.ShapeDtypeStruct((g_pad, W), jnp.float32)]
        + [jax.ShapeDtypeStruct(sh, jnp.float32) for sh in gshapes],
        interpret=interpret,
    )(seed_arr, x_t, qkv, attn0, strip, g, *layer_p, *consts, *c0,
      *extras)
    return outs[0], outs[1:]


def _grad_shapes(S, D, F):
    W, H = S * D, S * F
    C = _ffn_chunks(S, D)
    hc = H // C
    return ([(W, W), (W, W), (W, W), (1, W), (1, W), (1, W),
             (W, W), (1, W), (1, W), (1, W)]
            + [(W, hc)] * C
            + [(1, hc)] * C
            + [(hc, W)] * C
            + [(1, W), (1, W), (1, W)])


def _reduce_folded_grads(gs, S, D, F):
    """bd/tiled-shaped grads -> the layer's 12 true param grads."""
    C = (len(gs) - 13) // 3
    (dbd_q, dbd_k, dbd_v, dbq, dbk, dbv, dbd_o, dbo, dg1, db1) = gs[:10]
    dbd_w1 = jnp.concatenate(gs[10:10 + C], axis=1)
    dbf1 = jnp.concatenate(gs[10 + C:10 + 2 * C], axis=1)
    dbd_w2 = jnp.concatenate(gs[10 + 2 * C:10 + 3 * C], axis=0)
    dbf2, dg2, db2 = gs[10 + 3 * C:]

    def deblock(a, p, r):  # sum_i of diagonal blocks [p, r]
        return jnp.einsum("ipir->pr", a.reshape(S, p, S, r))

    def detile(b, r):
        return b.reshape(S, r).sum(0)

    dw_in = jnp.concatenate(
        [deblock(dbd_q, D, D), deblock(dbd_k, D, D), deblock(dbd_v, D, D)],
        axis=1)
    db_in = jnp.concatenate(
        [detile(dbq, D), detile(dbk, D), detile(dbv, D)])
    return (dw_in, db_in, deblock(dbd_o, D, D), detile(dbo, D),
            detile(dg1, D), detile(db1, D),
            deblock(dbd_w1, D, F), detile(dbf1, F),
            deblock(dbd_w2, F, D), detile(dbf2, D),
            detile(dg2, D), detile(db2, D))


def _folded_stored_fwd_call(x2d, params, seed, S, T, rate, tile_g,
                            interpret):
    D = x2d.shape[1]
    F = params[6].shape[2]
    stored = params[0].shape[0]
    consts = tuple(jnp.asarray(c) for c in folded_selectors(S, D))
    layer_ps = [_fold_params(params, t, stored, S) for t in range(T)]
    n_p = len(layer_ps[0])
    xf = fold_rows(x2d.astype(jnp.bfloat16), S)
    G = xf.shape[0]
    g_pad = ((G + tile_g - 1) // tile_g) * tile_g
    if g_pad != G:
        xf = jnp.pad(xf, ((0, g_pad - G), (0, 0)))
    grid = (g_pad // tile_g,)
    W = S * D
    n_saved = max(T - 1, 0)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)

    def rowspec(w):
        return pl.BlockSpec((tile_g, w), lambda i: (i, 0))

    c0 = tuple(jnp.asarray(c) for c in folded_slot0_selectors(S, D))
    extras = _slot0_extras(params, T - 1, stored)
    flat_p = [a for lp in layer_ps for a in lp]

    def attn_w(t):
        return S if t == T - 1 else S * S

    def strip_w(t):
        return 6 * D if t == T - 1 else 6 * W

    out_specs = (
        [rowspec(D)]
        + [rowspec(W) for _ in range(n_saved)]
        + [rowspec(3 * W) for _ in range(T)]      # qkv
        + [rowspec(attn_w(t)) for t in range(T)]  # attn (slot0 last)
        + [rowspec(strip_w(t)) for t in range(T)]
    )
    out_shape = (
        [jax.ShapeDtypeStruct((g_pad, D), jnp.float32)]
        + [jax.ShapeDtypeStruct((g_pad, W), jnp.bfloat16)
           for _ in range(n_saved)]
        + [jax.ShapeDtypeStruct((g_pad, 3 * W), jnp.bfloat16)
           for _ in range(T)]
        + [jax.ShapeDtypeStruct((g_pad, attn_w(t)), jnp.float32)
           for t in range(T)]
        + [jax.ShapeDtypeStruct((g_pad, strip_w(t)), jnp.float32)
           for t in range(T)]
    )
    outs = pl.pallas_call(
        functools.partial(_folded_stored_fwd_kernel, S=S, D=D, T=T,
                          rate=rate, n_const=len(consts), n_p=n_p),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0)), rowspec(W)]
        + [full(c) for c in consts] + [full(c) for c in c0]
        + [full(a) for a in flat_p] + [full(a) for a in extras],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(_seed_arr(seed), xf, *consts, *c0, *flat_p, *extras)
    out = outs[0]
    saved = tuple(outs[1:1 + n_saved])
    qkvs = tuple(outs[1 + n_saved:1 + n_saved + T])
    attns = tuple(outs[1 + n_saved + T:1 + n_saved + 2 * T])
    strips = tuple(outs[1 + n_saved + 2 * T:])
    return out[:G], (xf, G, saved, qkvs, attns, strips)


def _folded_bwd1_call(x_t, qkv, attn, strip, g, layer_p, consts, seed_arr,
                      *, S, D, F, rate, t_stream, tile_g, interpret):
    g_pad, W = x_t.shape
    grid = (g_pad // tile_g,)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)

    def rowspec(w):
        return pl.BlockSpec((tile_g, w), lambda i: (i, 0))

    gshapes = _grad_shapes(S, D, F)
    lp = tuple(layer_p) + (layer_p[10].T, layer_p[12].T)  # + w1ᵀ, w2ᵀ
    outs = pl.pallas_call(
        functools.partial(_folded_bwd_kernel, S=S, D=D, F=F, rate=rate,
                          t_stream=t_stream),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0)),
                  rowspec(W), rowspec(3 * W), rowspec(S * S),
                  rowspec(6 * W), rowspec(W)]
        + [full(a) for a in lp] + [full(c) for c in consts],
        out_specs=[rowspec(W)] + [full(jnp.zeros(s)) for s in gshapes],
        out_shape=[jax.ShapeDtypeStruct((g_pad, W), jnp.float32)]
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s in gshapes],
        interpret=interpret,
    )(seed_arr, x_t, qkv, attn, strip, g, *lp, *consts)
    return outs[0], outs[1:]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def folded_u2gnn_encoder_grad(x2d, params, seed, seq_len: int,
                              num_timesteps: int, rate: float = 0.0,
                              tile_g: int = 256, interpret: bool = False):
    """Differentiable folded-lane encoder: same contract as
    ``fused_u2gnn_encoder`` ([N·S, D] -> slot-0 [N, D]), with the folded
    stored-residual backward (small folded residuals stored; only the FFN
    hidden recomputes, one matmul; masks replay from the PRNG)."""
    return folded_u2gnn_encoder(x2d, params, seed, seq_len, num_timesteps,
                                rate, tile_g, interpret)


def _folded_grad_fwd(x2d, params, seed, S, T, rate, tile_g, interpret):
    out, (xf, G, saved, qkvs, attns, strips) = _folded_stored_fwd_call(
        x2d, params, seed, S, T, rate, tile_g, interpret)
    return out, (x2d, xf, params, seed, saved, qkvs, attns, strips)


def _folded_grad_bwd(S, T, rate, tile_g, interpret, res, dout):
    (x2d, xf, params, seed, saved, qkvs, attns, strips) = res
    x_shape, x_dtype = x2d.shape, x2d.dtype
    G = x_shape[0] // S
    D = x_shape[1]
    F = params[6].shape[2]
    stored = params[0].shape[0]
    W = S * D
    g_pad = xf.shape[0]
    n_tiles = g_pad // tile_g
    consts = tuple(jnp.asarray(c) for c in folded_selectors(S, D))
    c0 = tuple(jnp.asarray(c) for c in folded_slot0_selectors(S, D))
    extras = _slot0_extras(params, T - 1, stored)
    seed_arr = _seed_arr(seed)
    # dout [G, D], padded on rows only — the slot0 last-layer backward
    # consumes the D-lane cotangent directly
    g = jnp.pad(dout.astype(jnp.float32),
                ((0, g_pad - dout.shape[0]), (0, 0)))
    acc = [[None] * 12 for _ in range(stored)]
    for t in range(T - 1, -1, -1):
        x_t = xf if t == 0 else saved[t - 1]
        layer_p = _fold_params(params, t, stored, S)
        x_t = (x_t.astype(jnp.bfloat16)
               if x_t.dtype != jnp.bfloat16 else x_t)
        if t == T - 1:
            g, gs = _folded_bwd0_call(
                x_t, qkvs[t], attns[t], strips[t], g, layer_p, consts,
                c0, extras, seed_arr, S=S, D=D, F=F, rate=rate,
                t_stream=t * n_tiles, tile_g=tile_g, interpret=interpret)
            reduced = _reduce_slot0_grads(gs, S, D, F)
        else:
            g, gs = _folded_bwd1_call(
                x_t, qkvs[t], attns[t], strips[t], g, layer_p, consts,
                seed_arr, S=S, D=D, F=F, rate=rate,
                t_stream=t * n_tiles, tile_g=tile_g, interpret=interpret)
            reduced = _reduce_folded_grads(gs, S, D, F)
        ts = t % stored
        for j, dg in enumerate(reduced):
            acc[ts][j] = dg if acc[ts][j] is None else acc[ts][j] + dg
    dparams = []
    for j, p in enumerate(params):
        slices = [
            (acc[ts][j] if acc[ts][j] is not None
             else jnp.zeros(p.shape[1:], jnp.float32))
            for ts in range(stored)
        ]
        dparams.append(jnp.stack(slices).astype(p.dtype))
    dx = unfold_rows(g[:G], S)[:x_shape[0]].astype(x_dtype)
    seed_ct = (None if seed is None
               else np.zeros(np.shape(seed), jax.dtypes.float0))
    return dx, tuple(dparams), seed_ct


folded_u2gnn_encoder_grad.defvjp(_folded_grad_fwd, _folded_grad_bwd)


# ================================================== sampled + folded variant
def _fold_codebook(codebook, S):
    """(repeat-selector [S, S·C], kron codebook [S·C, S·D]) so the folded
    layer-0 input builds as ``onehot_folded @ bd_code`` — the folded twin
    of the sampled kernel's ``onehot(tag) @ codebook``."""
    C, D = codebook.shape
    rep = jnp.asarray(np.kron(np.eye(S, dtype=np.float32),
                              np.ones((1, C), np.float32)))  # [S, S·C]
    bd_code = jnp.kron(jnp.eye(S, dtype=codebook.dtype), codebook)
    return rep, bd_code


def _folded_sampled_fwd_kernel(seed_ref, tag_rows_ref, deg_ref,
                               self_tag_ref, rep_ref, bdcode_ref, *refs,
                               S, D, C, T, rate, n_const, n_p, stored_res):
    """Sampling preamble (same PRNG stream layout as the row-space sampled
    kernels: sampler on ``T·n_tiles + i``) + folded layer stack; with
    ``stored_res`` also writes the folded residuals for the stored bwd."""
    const = tuple(r[:] for r in refs[:n_const])
    c0sel = tuple(r[:] for r in refs[n_const:n_const + 5])
    kp = n_const + 5
    k0 = kp + T * n_p
    extras = tuple(r[:] for r in refs[k0:k0 + 4])
    out_ref = refs[k0 + 4]
    if stored_res:
        x0_ref = refs[k0 + 5]
        n_saved = max(T - 1, 0)
        saved_refs = refs[k0 + 6:k0 + 6 + n_saved]
        qkv_refs = refs[k0 + 6 + n_saved:k0 + 6 + n_saved + T]
        attn_refs = refs[k0 + 6 + n_saved + T:k0 + 6 + n_saved + 2 * T]
        strip_refs = refs[k0 + 6 + n_saved + 2 * T:]
    i = pl.program_id(0)
    G = tag_rows_ref.shape[0]

    # ---- sample neighbor tags (disjoint stream: T·n_tiles + i)
    pltpu.prng_seed(seed_ref[0, 0] + T * pl.num_programs(0) + i)
    bits = pltpu.bitcast(
        pltpu.prng_random_bits(tag_rows_ref.shape), jnp.uint32
    )
    u = (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    deg = jnp.clip(deg_ref[:], 1, 128).astype(jnp.float32)  # hub clamp
    idx = jnp.minimum(jnp.floor(u * deg), deg - 1.0).astype(jnp.int32)
    tags = jnp.take_along_axis(tag_rows_ref[:], idx, axis=1)  # [G, 128]

    # ---- folded layer-0 input: onehot in [G, S·C], then @ kron(I, code)
    all_tags = jnp.concatenate(
        [self_tag_ref[:], tags[:, : S - 1]], axis=1
    ).astype(jnp.float32)  # [G, S]
    tags_rep = jnp.dot(all_tags, rep_ref[:],
                       preferred_element_type=jnp.float32)  # [G, S·C]
    c_iota = (jax.lax.broadcasted_iota(jnp.int32, (G, S * C), 1)
              % C).astype(jnp.float32)
    oh = (tags_rep == c_iota).astype(jnp.float32)
    x = jnp.dot(oh, bdcode_ref[:], preferred_element_type=jnp.float32)
    x = x.astype(jnp.bfloat16)  # saved-dtype round trip (bwd replays this)
    if stored_res:
        x0_ref[:] = x
    h = x.astype(jnp.float32)

    mm = jnp.bfloat16
    for t in range(T):
        if stored_res and t > 0:
            saved_refs[t - 1][:] = h.astype(saved_refs[t - 1].dtype)
        if rate > 0.0:
            pltpu.prng_seed(seed_ref[0, 0] + t * pl.num_programs(0) + i)
        p = tuple(r[:] for r in refs[kp + t * n_p:kp + (t + 1) * n_p])
        if t == T - 1:
            h, res = _folded_layer_fwd_slot0(h, const, c0sel, p, extras,
                                             S=S, D=D, rate=rate, mm=mm,
                                             want_res=stored_res)
            if stored_res:
                qkv_refs[t][:] = res["qkv"].astype(qkv_refs[t].dtype)
                attn_refs[t][:] = res["attn0"]
                strip_refs[t][:] = res["strip"]
        elif stored_res:
            h, res = _folded_layer_fwd_res(h, const, p, S=S, D=D,
                                           rate=rate, mm=mm)
            qkv_refs[t][:] = res["qkv"].astype(qkv_refs[t].dtype)
            attn_refs[t][:] = res["attn"]
            strip_refs[t][:] = res["strip"]
        else:
            h = _folded_layer_fwd(h, const, p, S=S, D=D, rate=rate, mm=mm)
    out_ref[:] = h.astype(out_ref.dtype)  # [Gt, D] slot-0 output


def _folded_sampled_fwd_call(tag_rows, deg, self_tag, codebook, params,
                             seed, S, T, rate, tile_g, stored_res,
                             interpret):
    from graph_transformer_tpu.sampling.pallas_sampler import TABLE_WIDTH

    D = codebook.shape[1]
    C = codebook.shape[0]
    F = params[6].shape[2]
    stored = params[0].shape[0]
    W = S * D
    consts = tuple(jnp.asarray(c) for c in folded_selectors(S, D))
    layer_ps = [_fold_params(params, t, stored, S) for t in range(T)]
    n_p = len(layer_ps[0])
    rep, bd_code = _fold_codebook(codebook, S)
    n = tag_rows.shape[0]
    n_pad = ((n + tile_g - 1) // tile_g) * tile_g
    if n_pad != n:
        pad = n_pad - n
        tag_rows = jnp.pad(tag_rows, ((0, pad), (0, 0)))
        deg = jnp.pad(deg, ((0, pad), (0, 0)), constant_values=1)
        self_tag = jnp.pad(self_tag, ((0, pad), (0, 0)))
    grid = (n_pad // tile_g,)
    n_saved = max(T - 1, 0)

    def full(a):
        return pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)

    def rowspec(w):
        return pl.BlockSpec((tile_g, w), lambda i: (i, 0))

    c0 = tuple(jnp.asarray(c) for c in folded_slot0_selectors(S, D))
    extras = _slot0_extras(params, T - 1, stored)
    flat_p = [a for lp in layer_ps for a in lp]

    def attn_w(t):
        return S if t == T - 1 else S * S

    def strip_w(t):
        return 6 * D if t == T - 1 else 6 * W

    out_specs = [rowspec(D)]
    out_shape = [jax.ShapeDtypeStruct((n_pad, D), jnp.float32)]
    if stored_res:
        out_specs += (
            [rowspec(W)]                                   # x0 folded
            + [rowspec(W) for _ in range(n_saved)]
            + [rowspec(3 * W) for _ in range(T)]
            + [rowspec(attn_w(t)) for t in range(T)]
            + [rowspec(strip_w(t)) for t in range(T)]
        )
        out_shape += (
            [jax.ShapeDtypeStruct((n_pad, W), jnp.bfloat16)]
            + [jax.ShapeDtypeStruct((n_pad, W), jnp.bfloat16)
               for _ in range(n_saved)]
            + [jax.ShapeDtypeStruct((n_pad, 3 * W), jnp.bfloat16)
               for _ in range(T)]
            + [jax.ShapeDtypeStruct((n_pad, attn_w(t)), jnp.float32)
               for t in range(T)]
            + [jax.ShapeDtypeStruct((n_pad, strip_w(t)), jnp.float32)
               for t in range(T)]
        )
    outs = pl.pallas_call(
        functools.partial(_folded_sampled_fwd_kernel, S=S, D=D, C=C, T=T,
                          rate=rate, n_const=len(consts), n_p=n_p,
                          stored_res=stored_res),
        grid=grid,
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0)),
                  pl.BlockSpec((tile_g, TABLE_WIDTH), lambda i: (i, 0)),
                  pl.BlockSpec((tile_g, 1), lambda i: (i, 0)),
                  pl.BlockSpec((tile_g, 1), lambda i: (i, 0)),
                  full(rep), full(bd_code)]
        + [full(c) for c in consts] + [full(c) for c in c0]
        + [full(a) for a in flat_p] + [full(a) for a in extras],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(_seed_arr(seed), tag_rows, deg, self_tag, rep, bd_code, *consts,
      *c0, *flat_p, *extras)
    if not stored_res:
        return outs[0][:n] if isinstance(outs, (list, tuple)) else outs[:n]
    out = outs[0][:n]
    x0 = outs[1]
    saved = tuple(outs[2:2 + n_saved])
    qkvs = tuple(outs[2 + n_saved:2 + n_saved + T])
    attns = tuple(outs[2 + n_saved + T:2 + n_saved + 2 * T])
    strips = tuple(outs[2 + n_saved + 2 * T:])
    return out, (x0, saved, qkvs, attns, strips)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def folded_u2gnn_encoder_sampled(tag_rows, deg, self_tag, codebook, params,
                                 seed, seq_len: int, num_timesteps: int,
                                 rate: float = 0.0, tile_g: int = 128,
                                 interpret: bool = False):
    """Sample + build codebook features + T-layer FOLDED encoder in one
    kernel, with the folded stored-residual backward — the folded twin of
    ``fused_u2gnn_encoder_sampled_stored``.  Same [N]-rows contract."""
    out = _folded_sampled_fwd_call(
        tag_rows, deg, self_tag, codebook, params, seed, seq_len,
        num_timesteps, rate, tile_g, False, interpret)
    return out


def _folded_sampled_fwd_rule(tag_rows, deg, self_tag, codebook, params,
                             seed, S, T, rate, tile_g, interpret):
    out, (x0, saved, qkvs, attns, strips) = _folded_sampled_fwd_call(
        tag_rows, deg, self_tag, codebook, params, seed, S, T, rate,
        tile_g, True, interpret)
    shapes = (tag_rows.shape, deg.shape, self_tag.shape)
    return out, (x0, params, seed, saved, qkvs, attns, strips, shapes,
                 codebook.shape)


def _folded_sampled_bwd_rule(S, T, rate, tile_g, interpret, res, dout):
    (x0, params, seed, saved, qkvs, attns, strips, shapes,
     code_shape) = res
    D = code_shape[1]
    F = params[6].shape[2]
    stored = params[0].shape[0]
    W = S * D
    g_pad = x0.shape[0]
    n_tiles = g_pad // tile_g
    consts = tuple(jnp.asarray(c) for c in folded_selectors(S, D))
    c0 = tuple(jnp.asarray(c) for c in folded_slot0_selectors(S, D))
    extras = _slot0_extras(params, T - 1, stored)
    seed_arr = _seed_arr(seed)
    # dout [G, D], padded on rows only (slot0 last-layer backward)
    g = jnp.pad(dout.astype(jnp.float32),
                ((0, g_pad - dout.shape[0]), (0, 0)))
    acc = [[None] * 12 for _ in range(stored)]
    for t in range(T - 1, -1, -1):
        x_t = x0 if t == 0 else saved[t - 1]
        layer_p = _fold_params(params, t, stored, S)
        if t == T - 1:
            g, gs = _folded_bwd0_call(
                x_t, qkvs[t], attns[t], strips[t], g, layer_p, consts,
                c0, extras, seed_arr, S=S, D=D, F=F, rate=rate,
                t_stream=t * n_tiles, tile_g=tile_g, interpret=interpret)
            reduced = _reduce_slot0_grads(gs, S, D, F)
        else:
            g, gs = _folded_bwd1_call(
                x_t, qkvs[t], attns[t], strips[t], g, layer_p, consts,
                seed_arr, S=S, D=D, F=F, rate=rate, t_stream=t * n_tiles,
                tile_g=tile_g, interpret=interpret)
            reduced = _reduce_folded_grads(gs, S, D, F)
        ts = t % stored
        for j, dg in enumerate(reduced):
            acc[ts][j] = dg if acc[ts][j] is None else acc[ts][j] + dg
    dparams = []
    for j, p in enumerate(params):
        slices = [
            (acc[ts][j] if acc[ts][j] is not None
             else jnp.zeros(p.shape[1:], jnp.float32))
            for ts in range(stored)
        ]
        dparams.append(jnp.stack(slices).astype(p.dtype))
    ct_int = lambda s: np.zeros(s, jax.dtypes.float0)
    return (ct_int(shapes[0]), ct_int(shapes[1]), ct_int(shapes[2]),
            jnp.zeros(code_shape, jnp.float32), tuple(dparams),
            np.zeros(np.shape(seed), jax.dtypes.float0))


folded_u2gnn_encoder_sampled.defvjp(_folded_sampled_fwd_rule,
                                    _folded_sampled_bwd_rule)
