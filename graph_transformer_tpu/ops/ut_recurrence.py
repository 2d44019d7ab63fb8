"""Universal-Transformer recurrence variants.

The reference vendors the full tensor2tensor recurrence-function zoo —
basic / skip / highway / gru / lstm / ACT
(``universal_transformer_modified_utils.py:552-1654``) — though its models
run only the ``basic`` step.  Here the same transition functions apply
between weight-tied encoder timesteps:

- ``basic``:   state ← layer(state)                       (``utils.py:552-584``)
- ``skip``:    state ← layer(state) + x₀  (residual to the original input,
               ``universal_transformer_with_skip`` semantics)
- ``highway``: gated blend σ(Wₛs + Wₒo + b) between previous state and layer
               output (``utils.py`` highway recurrence)
- ``gru``:     GRU cell with the layer output as the "input"
               (``utils.py`` gru recurrence)
- ``act``:     Adaptive Computation Time — per-position halting probabilities
               accumulate until 1−ε; the returned state is the
               halting-weighted average of per-step states, plus the ponder
               cost (N(t) + remainder, the ``act_loss`` scalar the vendored
               model adds at ``universal_transformer_modified.py:343``).

All transitions are elementwise over ``[B, S, D]`` states; parameters are
small ``[D, D]`` matrices, so XLA fuses them into the surrounding encoder.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def _xavier(key, shape, dtype=jnp.float32):
    import math

    bound = math.sqrt(6.0 / (shape[-2] + shape[-1]))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HighwayParams:
    w_state: jax.Array  # [D, D]
    w_out: jax.Array  # [D, D]
    b: jax.Array  # [D]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GRUParams:
    w_z: jax.Array  # [2D, D] packed (state; out) -> update gate
    b_z: jax.Array  # [D]
    w_r: jax.Array  # [2D, D] -> reset gate (packed the same way)
    b_r: jax.Array
    w_h: jax.Array  # [2D, D] -> candidate
    b_h: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LSTMParams:
    w_i: jax.Array  # [2D, D] packed (state; out) -> input gate
    b_i: jax.Array  # [D]
    w_f: jax.Array  # [2D, D] -> forget gate
    b_f: jax.Array
    w_o: jax.Array  # [2D, D] -> output gate
    b_o: jax.Array
    w_c: jax.Array  # [2D, D] -> cell candidate
    b_c: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DWAParams:
    """Depth-wise attention: each timestep attends over the stack of all
    previous states (the t2t ``depthwise_attention`` recurrence)."""

    w_q: jax.Array  # [D, D]
    w_k: jax.Array  # [D, D]
    w_v: jax.Array  # [D, D]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ACTParams:
    w_halt: jax.Array  # [D]
    b_halt: jax.Array  # [] scalar (t2t initializes the halting bias to 1.0)


def init_recurrence_params(
    key: jax.Array, kind: str, d_model: int, dtype=jnp.float32
):
    """Parameters for one recurrence kind (``None`` for basic/skip)."""
    if kind in ("basic", "skip"):
        return None
    if kind == "highway":
        k1, k2 = jax.random.split(key)
        return HighwayParams(
            w_state=_xavier(k1, (d_model, d_model), dtype),
            w_out=_xavier(k2, (d_model, d_model), dtype),
            b=jnp.zeros((d_model,), dtype),
        )
    if kind == "gru":
        ks = jax.random.split(key, 3)
        D = d_model

        def packed(k):
            a = _xavier(jax.random.fold_in(k, 0), (D, D), dtype)
            b = _xavier(jax.random.fold_in(k, 1), (D, D), dtype)
            return jnp.concatenate([a, b], axis=0)  # [2D, D]

        return GRUParams(
            w_z=packed(ks[0]), b_z=jnp.zeros((D,), dtype),
            w_r=packed(ks[1]), b_r=jnp.zeros((D,), dtype),
            w_h=packed(ks[2]), b_h=jnp.zeros((D,), dtype),
        )
    if kind == "lstm":
        ks = jax.random.split(key, 4)
        D = d_model

        def packed(k):
            a = _xavier(jax.random.fold_in(k, 0), (D, D), dtype)
            b = _xavier(jax.random.fold_in(k, 1), (D, D), dtype)
            return jnp.concatenate([a, b], axis=0)  # [2D, D]

        return LSTMParams(
            w_i=packed(ks[0]), b_i=jnp.zeros((D,), dtype),
            # forget bias 1.0 (standard LSTM init, also t2t's default)
            w_f=packed(ks[1]), b_f=jnp.ones((D,), dtype),
            w_o=packed(ks[2]), b_o=jnp.zeros((D,), dtype),
            w_c=packed(ks[3]), b_c=jnp.zeros((D,), dtype),
        )
    if kind == "dwa":
        ks = jax.random.split(key, 3)
        return DWAParams(
            w_q=_xavier(ks[0], (d_model, d_model), dtype),
            w_k=_xavier(ks[1], (d_model, d_model), dtype),
            w_v=_xavier(ks[2], (d_model, d_model), dtype),
        )
    if kind == "act":
        return ACTParams(
            w_halt=_xavier(key, (1, d_model), dtype)[0],
            b_halt=jnp.asarray(1.0, dtype),
        )
    raise ValueError(f"unknown recurrence {kind!r}")


def highway_step(p: HighwayParams, state: jax.Array, out: jax.Array) -> jax.Array:
    gate = jax.nn.sigmoid(state @ p.w_state + out @ p.w_out + p.b)
    return gate * out + (1.0 - gate) * state


def gru_step(p: GRUParams, state: jax.Array, out: jax.Array) -> jax.Array:
    so = jnp.concatenate([state, out], axis=-1)  # [..., 2D]
    z = jax.nn.sigmoid(so @ p.w_z + p.b_z)
    r = jax.nn.sigmoid(so @ p.w_r + p.b_r)
    cand = jnp.tanh(jnp.concatenate([r * state, out], axis=-1) @ p.w_h + p.b_h)
    return (1.0 - z) * state + z * cand


def lstm_step(
    p: LSTMParams, state: jax.Array, cell: jax.Array, out: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """One LSTM transition; returns (new_state, new_cell)."""
    so = jnp.concatenate([state, out], axis=-1)  # [..., 2D]
    i = jax.nn.sigmoid(so @ p.w_i + p.b_i)
    f = jax.nn.sigmoid(so @ p.w_f + p.b_f)
    o = jax.nn.sigmoid(so @ p.w_o + p.b_o)
    c = f * cell + i * jnp.tanh(so @ p.w_c + p.b_c)
    return o * jnp.tanh(c), c


def dwa_step(p: DWAParams, history: jax.Array, out: jax.Array) -> jax.Array:
    """Depth-wise attention over the state history.

    ``history`` [t+1, B, S, D] stacks x₀ and all previous states; the new
    state is attention of the current layer output (query) over the history
    (keys/values) — depth is the attention axis, positions stay independent.
    """
    q = out @ p.w_q  # [B, S, D]
    k = history @ p.w_k  # [t+1, B, S, D]
    v = history @ p.w_v
    scores = jnp.einsum("bsd,tbsd->tbs", q, k) / jnp.sqrt(
        jnp.asarray(q.shape[-1], q.dtype)
    )
    w = jax.nn.softmax(scores, axis=0)
    return jnp.einsum("tbs,tbsd->bsd", w, v)


def act_encoder(
    layer_fn: Callable[[jax.Array, int], jax.Array],  # (state, t) -> out
    x: jax.Array,  # [B, S, D]
    p: ACTParams,
    max_steps: int,
    epsilon: float = 0.01,
) -> Tuple[jax.Array, jax.Array]:
    """ACT over weight-tied timesteps.

    Returns ``(state, ponder_cost)`` where ``state`` is the halting-weighted
    average of per-step outputs and ``ponder_cost`` is the scalar mean of
    (steps taken + remainder) — the quantity t2t adds to the loss as
    ``act_loss``.  ``max_steps`` is unrolled (tiny in all configs), keeping
    shapes static for XLA.
    """
    B, S, _ = x.shape
    state = x
    halt_sum = jnp.zeros((B, S), x.dtype)
    remainder = jnp.zeros((B, S), x.dtype)
    n_updates = jnp.zeros((B, S), x.dtype)
    weighted = jnp.zeros_like(x)
    still = jnp.ones((B, S), x.dtype)

    for t in range(max_steps):
        out = layer_fn(state, t)
        h = jax.nn.sigmoid(out @ p.w_halt + p.b_halt)  # [B, S]
        last = t == max_steps - 1
        new_sum = halt_sum + h * still
        halting_now = (new_sum > 1.0 - epsilon) | jnp.bool_(last)
        rem_here = 1.0 - halt_sum
        use = jnp.where(halting_now, rem_here, h) * still
        weighted = weighted + use[..., None] * out
        remainder = remainder + jnp.where(halting_now, rem_here, 0.0) * still
        n_updates = n_updates + still
        halt_sum = halt_sum + use
        still = still * (1.0 - halting_now.astype(x.dtype))
        state = out
    ponder = jnp.mean(n_updates + remainder)
    return weighted, ponder
