"""Neighborhood transformer encoder (the U2GNN aggregation function).

A functional re-implementation of the transformer encoder stack the reference
builds from ``nn.TransformerEncoder(TransformerEncoderLayer(...))``
(``pytorch_U2GNN_Sup.py:20-21``): post-norm layers, packed-QKV multi-head
attention, ReLU feedforward — expressed as explicit parameter pytrees so that

- the Universal-Transformer weight-tied recurrence (the TF implementation's
  ``tf.foldl`` over timesteps, ``universal_transformer_modified_utils.py:
  251-252``) is a ``lax.scan`` over one layer's params,
- torch-weight copying for activation-parity tests is mechanical,
- sharding annotations attach to plain arrays.

Attention axis (SURVEY.md §3.1 quirk): the intended semantics attend over the
sampled neighborhood (sequence = K+1 slots; TF impl
``model_U2GNN_Sup_multi.py:14-15``).  The PyTorch reference feeds
``[N, K+1, d]`` into a ``(S, B, E)`` encoder, so attention actually runs
across the *node* axis.  ``axis='neighborhood'`` (default) is the intended
path; ``axis='node'`` reproduces the quirk for allclose parity checks.

Weight convention: all matrices are stored ``[in, out]`` (JAX convention,
``y = x @ W + b``); torch stores ``[out, in]``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TransformerEncoderParams:
    """Stacked parameters of T post-norm encoder layers.

    Every leaf has a leading ``[T]`` axis (T = num timestep layers); with
    weight sharing T == 1 and the scan replays the same slice.
    """

    w_in: jax.Array  # [T, D, 3D] packed q,k,v
    b_in: jax.Array  # [T, 3D]
    w_out: jax.Array  # [T, D, D]
    b_out: jax.Array  # [T, D]
    w_ff1: jax.Array  # [T, D, F]
    b_ff1: jax.Array  # [T, F]
    w_ff2: jax.Array  # [T, F, D]
    b_ff2: jax.Array  # [T, D]
    ln1_scale: jax.Array  # [T, D]
    ln1_bias: jax.Array  # [T, D]
    ln2_scale: jax.Array  # [T, D]
    ln2_bias: jax.Array  # [T, D]


def _xavier(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[-2], shape[-1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def init_encoder_params(
    key: jax.Array,
    num_layers: int,
    d_model: int,
    ff_hidden: int,
    dtype=jnp.float32,
) -> TransformerEncoderParams:
    T, D, F = num_layers, d_model, ff_hidden
    return TransformerEncoderParams(
        w_in=jnp.stack([_xavier(jax.random.fold_in(key, 10 + t), (D, 3 * D), dtype) for t in range(T)]),
        b_in=jnp.zeros((T, 3 * D), dtype),
        w_out=jnp.stack([_xavier(jax.random.fold_in(key, 100 + t), (D, D), dtype) for t in range(T)]),
        b_out=jnp.zeros((T, D), dtype),
        w_ff1=jnp.stack([_xavier(jax.random.fold_in(key, 200 + t), (D, F), dtype) for t in range(T)]),
        b_ff1=jnp.zeros((T, F), dtype),
        w_ff2=jnp.stack([_xavier(jax.random.fold_in(key, 300 + t), (F, D), dtype) for t in range(T)]),
        b_ff2=jnp.zeros((T, D), dtype),
        ln1_scale=jnp.ones((T, D), dtype),
        ln1_bias=jnp.zeros((T, D), dtype),
        ln2_scale=jnp.ones((T, D), dtype),
        ln2_bias=jnp.zeros((T, D), dtype),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MHAParams:
    """Standalone multi-head attention (torch ``nn.MultiheadAttention``
    equivalent) — used for the fork's cross-layer attention
    (``pytorch_U2GNN_UnSup.py:18,69-73``)."""

    w_in: jax.Array  # [D, 3D]
    b_in: jax.Array  # [3D]
    w_out: jax.Array  # [D, D]
    b_out: jax.Array  # [D]


def init_mha_params(key: jax.Array, d_model: int, dtype=jnp.float32) -> MHAParams:
    k1, k2 = jax.random.split(key)
    return MHAParams(
        w_in=_xavier(k1, (d_model, 3 * d_model), dtype),
        b_in=jnp.zeros((3 * d_model,), dtype),
        w_out=_xavier(k2, (d_model, d_model), dtype),
        b_out=jnp.zeros((d_model,), dtype),
    )


def multihead_attention(
    p: MHAParams,
    x: jax.Array,  # [B, S, D] self-attention input
    num_heads: int = 1,
    dropout_rate: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Self multi-head attention returning [B, S, D]."""
    B, S, D = x.shape
    H, hd = num_heads, D // num_heads
    qkv = x @ p.w_in + p.b_in
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, S, H, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scores = jnp.einsum(
        "bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(hd)
    attn = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    if rng is not None:
        attn = _dropout(attn, dropout_rate, rng)
    ctx = jnp.einsum("bhst,bhtd->bhsd", attn, v, preferred_element_type=jnp.float32)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, D).astype(x.dtype)
    return ctx @ p.w_out + p.b_out


def _layer_norm(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _dropout(x, rate, key):
    if key is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def _encoder_layer(
    x: jax.Array,  # [B, S, D]
    p,  # one layer's slice of TransformerEncoderParams (no leading T)
    num_heads: int,
    dropout_rate: float,
    rng: Optional[jax.Array],
    key_mask: Optional[jax.Array] = None,  # [S] 1.0 = attend, 0.0 = exclude
    use_pallas: bool = False,
) -> jax.Array:
    """One post-norm torch-semantics encoder layer.

    attn → dropout → +residual → LN1 → FF(relu, dropout) → dropout →
    +residual → LN2 (torch 1.5 ``TransformerEncoderLayer.forward``).
    """
    B, S, D = x.shape
    H = num_heads
    hd = D // H
    compute = x.dtype

    from graph_transformer_tpu.ops.pallas_encoder import (
        fused_encoder_layer,
        on_tpu as _on_tpu,
    )

    # Fully-fused encoder-layer kernel: attention + FFN + both LNs in one
    # Pallas pass (ops/pallas_encoder.py).  Single-head, unmasked
    # (neighborhood-axis) attention only; off-TPU the interpret-mode kernel
    # covers the deterministic path.
    fused_ok = (
        use_pallas
        and H == 1
        and key_mask is None
        and (_on_tpu() or rng is None or dropout_rate <= 0.0)
    )
    if fused_ok:
        if rng is not None and dropout_rate > 0.0:
            rng, sub = jax.random.split(rng)
            seed = jax.random.randint(sub, (1,), 0, 2**31 - 1, jnp.int32)
            rate = dropout_rate
        else:
            seed, rate = None, 0.0
        out2d = fused_encoder_layer(
            x.reshape(B * S, D),
            p["w_in"], p["b_in"], p["w_out"], p["b_out"],
            p["ln1_scale"], p["ln1_bias"],
            p["w_ff1"], p["b_ff1"], p["w_ff2"], p["b_ff2"],
            p["ln2_scale"], p["ln2_bias"],
            # tile target 512: smaller tiles lose more to per-grid-step
            # overhead than they save on [R,R] scores/softmax work
            # (v5e sweep: full step 11.6 ms @512 vs 13.0 ms @256)
            seed, S, rate, 512, not _on_tpu(),
        )
        return out2d.reshape(B, S, D)

    qkv = x @ p["w_in"] + p["b_in"]  # [B, S, 3D]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):  # [B, S, D] -> [B, H, S, hd]
        return t.reshape(B, S, H, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scores = jnp.einsum(
        "bhsd,bhtd->bhst", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(hd)
    if key_mask is not None:
        scores = jnp.where(key_mask[None, None, None, :] > 0, scores, -1e30)
    attn = jax.nn.softmax(scores, axis=-1).astype(compute)
    if rng is not None:
        rng, sub = jax.random.split(rng)
        attn = _dropout(attn, dropout_rate, sub)
    ctx = jnp.einsum("bhst,bhtd->bhsd", attn, v, preferred_element_type=jnp.float32)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, D).astype(compute)
    attn_out = ctx @ p["w_out"] + p["b_out"]
    if rng is not None:
        rng, sub = jax.random.split(rng)
        attn_out = _dropout(attn_out, dropout_rate, sub)
    x = _layer_norm(x + attn_out, p["ln1_scale"], p["ln1_bias"])

    from graph_transformer_tpu.ops.pallas_ffn import on_tpu

    # In-kernel dropout needs the TPU PRNG; off-TPU the interpret-mode kernel
    # only covers the deterministic path, so training falls back to XLA.
    pallas_ok = use_pallas and (
        on_tpu() or rng is None or dropout_rate <= 0.0
    )
    if pallas_ok:
        # Fused FFN+residual+LN2 kernel: the [B·S, F] hidden never touches
        # HBM (forward or backward) — see ops/pallas_ffn.py.
        from graph_transformer_tpu.ops.pallas_ffn import ffn_residual_ln

        if rng is not None and dropout_rate > 0.0:
            rng, sub = jax.random.split(rng)
            seed = jax.random.randint(sub, (1,), 0, 2**31 - 1, jnp.int32)
            rate = dropout_rate
        else:
            seed, rate = None, 0.0
        out2d = ffn_residual_ln(
            x.reshape(B * S, D),
            p["w_ff1"], p["b_ff1"], p["w_ff2"], p["b_ff2"],
            p["ln2_scale"], p["ln2_bias"],
            seed, rate, 512, not on_tpu(),
        )
        return out2d.reshape(B, S, D)

    h = jax.nn.relu(x @ p["w_ff1"] + p["b_ff1"])
    if rng is not None:
        rng, sub = jax.random.split(rng)
        h = _dropout(h, dropout_rate, sub)
    h = h @ p["w_ff2"] + p["b_ff2"]
    if rng is not None:
        rng, sub = jax.random.split(rng)
        h = _dropout(h, dropout_rate, sub)
    return _layer_norm(x + h, p["ln2_scale"], p["ln2_bias"])


def transformer_encoder(
    params: TransformerEncoderParams,
    x: jax.Array,  # [B, S, D]
    num_heads: int = 1,
    dropout_rate: float = 0.5,
    rng: Optional[jax.Array] = None,
    num_timesteps: Optional[int] = None,
    key_mask: Optional[jax.Array] = None,
    use_pallas: bool = False,
    recurrence: str = "basic",
    rec_params=None,
    return_ponder: bool = False,
) -> jax.Array:
    """Run the T-layer encoder stack (or T weight-tied timesteps).

    ``return_ponder``: also return the ACT ponder cost (the scalar t2t adds
    to the loss as ``act_loss``, ``universal_transformer_modified.py:343``);
    0.0 for non-ACT recurrences.

    If ``num_timesteps`` exceeds the stored layer count, the parameter stack
    is replayed cyclically — with a single stored layer this is exactly the
    Universal-Transformer recurrence (weights shared across timesteps).
    ``key_mask`` [S] excludes padding positions from every attention softmax.

    ``recurrence`` selects the Universal-Transformer transition function
    between timesteps (basic | skip | highway | gru | act — the vendored t2t
    zoo, ``universal_transformer_modified_utils.py:552-1654``); non-basic
    kinds other than ``skip`` need matching ``rec_params``
    (:func:`~graph_transformer_tpu.ops.ut_recurrence.init_recurrence_params`).
    """
    stored = params.w_in.shape[0]
    T = stored if num_timesteps is None else num_timesteps

    def layer_at(h, t, sub):
        p = jax.tree_util.tree_map(lambda a: a[t % stored], params)
        return _encoder_layer(
            h, dataclasses.asdict(p), num_heads, dropout_rate, sub, key_mask,
            use_pallas,
        )

    def split():
        nonlocal rng
        if rng is None:
            return None
        rng, sub = jax.random.split(rng)
        return sub

    if recurrence == "act":
        from graph_transformer_tpu.ops.ut_recurrence import act_encoder

        subs = [split() for _ in range(T)]
        out, ponder = act_encoder(
            lambda h, t: layer_at(h, t, subs[t]), x, rec_params, T
        )
        return (out, ponder) if return_ponder else out

    # Unrolled python loop: T is tiny (≤6 in all reference configs) and
    # unrolling lets XLA fuse across layers; a lax.scan would force dynamic
    # slicing of the stacked params for no benefit at this depth.
    h = x
    cell = jnp.zeros_like(x) if recurrence == "lstm" else None
    history = [x] if recurrence == "dwa" else None
    for t in range(T):
        out = layer_at(h, t, split())
        if recurrence == "basic":
            h = out
        elif recurrence == "skip":
            h = out + x
        elif recurrence == "highway":
            from graph_transformer_tpu.ops.ut_recurrence import highway_step

            h = highway_step(rec_params, h, out)
        elif recurrence == "gru":
            from graph_transformer_tpu.ops.ut_recurrence import gru_step

            h = gru_step(rec_params, h, out)
        elif recurrence == "lstm":
            from graph_transformer_tpu.ops.ut_recurrence import lstm_step

            h, cell = lstm_step(rec_params, h, cell, out)
        elif recurrence == "dwa":
            from graph_transformer_tpu.ops.ut_recurrence import dwa_step

            h = dwa_step(rec_params, jnp.stack(history), out)
            history.append(h)
        else:
            raise ValueError(f"unknown recurrence {recurrence!r}")
    return (h, jnp.zeros((), h.dtype)) if return_ponder else h


def neighborhood_encoder(
    params: TransformerEncoderParams,
    neigh_feat: jax.Array,  # [N_pad, K+1, D] gathered neighborhood features
    num_heads: int = 1,
    dropout_rate: float = 0.5,
    rng: Optional[jax.Array] = None,
    axis: str = "neighborhood",
    num_timesteps: Optional[int] = None,
    node_mask: Optional[jax.Array] = None,  # [N_pad] — used by axis='node'
    use_pallas: bool = False,
    recurrence: str = "basic",
    rec_params=None,
    return_ponder: bool = False,
    whole_encoder: bool = False,
) -> jax.Array:
    """Encode sampled neighborhoods; return updated *self* vectors [N_pad, D]
    (``(out, ponder_cost)`` when ``return_ponder`` — 0.0 unless ACT).

    ``axis='neighborhood'``: attention over the K+1 slots of each node
    (intended semantics).  ``axis='node'``: attention across the node axis
    within each neighbor column — the PyTorch reference's accidental axis
    (``pytorch_U2GNN_Sup.py:32-36``), kept for activation parity; padding
    rows are masked out of the softmax so padded batches reproduce the
    reference's unpadded activations exactly.
    Slot 0 (self) is returned either way, matching ``split(dim=1)[0]``.
    """
    if axis == "neighborhood":
        from graph_transformer_tpu.ops.pallas_encoder import on_tpu as _on_tpu

        stored = params.w_in.shape[0]
        T = stored if num_timesteps is None else num_timesteps
        # Whole-encoder mega-kernel: all T layers + slot-0 extraction in one
        # pallas_call fwd / one bwd (ops/pallas_u2gnn.py).  Basic recurrence,
        # single head only; off-TPU the interpret kernel covers the
        # deterministic path.
        fused_ok = (
            use_pallas
            and whole_encoder
            and num_heads == 1
            and recurrence == "basic"
            and (_on_tpu() or rng is None or dropout_rate <= 0.0)
        )
        if fused_ok:
            from graph_transformer_tpu.ops.pallas_u2gnn import (
                fused_u2gnn_encoder,
            )

            B, S, D = neigh_feat.shape
            if rng is not None and dropout_rate > 0.0:
                rng, sub = jax.random.split(rng)
                seed = jax.random.randint(sub, (1,), 0, 2**31 - 1, jnp.int32)
                rate = dropout_rate
            else:
                seed, rate = None, 0.0
            stacked = (
                params.w_in, params.b_in, params.w_out, params.b_out,
                params.ln1_scale, params.ln1_bias,
                params.w_ff1, params.b_ff1, params.w_ff2, params.b_ff2,
                params.ln2_scale, params.ln2_bias,
            )
            out = fused_u2gnn_encoder(
                neigh_feat.reshape(B * S, D), stacked, seed,
                S, T, rate, 512, not _on_tpu(),
            ).astype(neigh_feat.dtype)
            if return_ponder:
                return out, jnp.zeros((), out.dtype)
            return out
        out = transformer_encoder(
            params, neigh_feat, num_heads, dropout_rate, rng, num_timesteps,
            use_pallas=use_pallas, recurrence=recurrence, rec_params=rec_params,
            return_ponder=return_ponder,
        )
        if return_ponder:
            out, ponder = out
            return out[:, 0, :], ponder
        return out[:, 0, :]
    elif axis == "node":
        # [N, K+1, D] -> sequences along N: batch = K+1 columns
        x = neigh_feat.transpose(1, 0, 2)  # [K+1, N, D]
        out = transformer_encoder(
            params, x, num_heads, dropout_rate, rng, num_timesteps,
            key_mask=node_mask, use_pallas=use_pallas,
            recurrence=recurrence, rec_params=rec_params,
            return_ponder=return_ponder,
        )
        if return_ponder:
            out, ponder = out
            return out[0, :, :], ponder
        return out[0, :, :]  # self column
    raise ValueError(f"unknown attention axis {axis!r}")


# --------------------------------------------------------------------------
# Vestigial "smaller" encoder layer (capability parity with
# TransformerEncoderLayerSmaller, ``layers.py:96-176``: linear(d→ff) → relu →
# self-attention in ff dims → dropout → +bias; no layer norm, no residual).
# The reference constructs it but leaves it commented out in the UnSup model
# (``pytorch_U2GNN_UnSup.py:31-36``); it is exposed here for experiments.
# --------------------------------------------------------------------------
@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SmallerEncoderLayerParams:
    w_lin: jax.Array  # [D, F] xavier
    b_lin: jax.Array  # [F]
    attn: MHAParams  # attention over F-dim states
    bias: jax.Array  # [F] (zeros init)


def init_smaller_encoder_layer(
    key: jax.Array, d_model: int, ff_hidden: int, dtype=jnp.float32
) -> SmallerEncoderLayerParams:
    k1, k2 = jax.random.split(key)
    return SmallerEncoderLayerParams(
        w_lin=_xavier(k1, (d_model, ff_hidden), dtype),
        b_lin=jnp.zeros((ff_hidden,), dtype),
        attn=init_mha_params(k2, ff_hidden, dtype),
        bias=jnp.zeros((ff_hidden,), dtype),
    )


def smaller_encoder_layer(
    p: SmallerEncoderLayerParams,
    x: jax.Array,  # [B, S, D]
    num_heads: int = 1,
    dropout_rate: float = 0.5,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """[B, S, F] — semantics of ``TransformerEncoderLayerSmaller.forward``
    (``layers.py:152-176``).  In training mode the reference's
    ``nn.MultiheadAttention(dropout=dropout)`` (``layers.py:119``) also drops
    attention weights, so an rng is split between the attention-weight
    dropout and the output dropout."""
    h = jax.nn.relu(x @ p.w_lin + p.b_lin)
    if rng is not None:
        k_attn, k_out = jax.random.split(rng)
    else:
        k_attn = k_out = None
    out = multihead_attention(
        p.attn, h, num_heads=num_heads, dropout_rate=dropout_rate, rng=k_attn
    )
    if k_out is not None:
        out = _dropout(out, dropout_rate, k_out)
    return out + p.bias
