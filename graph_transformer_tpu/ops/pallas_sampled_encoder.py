"""Fully-fused sample+gather+encode kernel (the round-2 named optimization,
BASELINE.md:88-95; VERDICT r3 item 6 — measured A/B behind a flag).

The bench train step still pays two passes before the encoder kernel:
the Pallas lane-gather sampler (0.32 ms) and the XLA feature gather
``x_global[ng]`` (0.14 ms), plus the [(K+1)·N, D] HBM round-trip of the
gathered features.  There is no fast arbitrary ROW gather on this hardware
(the round-3 finding: ~11 µs per 1K elements in every XLA formulation,
and ``tpu.DynamicGatherOp`` only gathers along ≤128 lanes), so a general
fused gather is off the table.  But the TU/REDDIT datasets' features are
ONE-HOT tags — feature lookup is a *tag* lookup, and the tag table can be
pre-gathered into the [N, 128] neighbor-table layout the sampler already
lane-gathers.  One kernel then does everything:

    per tile (G = R/S neighborhoods):
      bits = on-core PRNG                      [G, 128]
      idx  = floor(u · deg)                    (float-scaled)
      tags = take_along_axis(tag_rows, idx)    lane gather
      x    = onehot([self_tag, tags[:, :K]])   iota compare, in VMEM
      out  = T-layer U2GNN encoder (mega fwd)  slot-0 rows

The forward also emits the built one-hot ``x0`` rows so the unchanged
per-layer HYBRID backward (ops/pallas_u2gnn) runs from the same saved
inputs — sequential [R, D] writes are ~free next to the random-access
gathers this deletes.

PRNG stream layout: dropout uses streams ``t·n_tiles + i`` for
t ∈ [0, T); the sampler takes stream ``T·n_tiles + i`` — disjoint, so the
backward's per-layer replay is unaffected.

Applicability gate: feature rows take ≤ 128 distinct values
(``dataset_codebook`` — one-hot tags, degree one-hots, the REDDIT ×0.01
constant rule).  Hub nodes (degree > 128) ride the subsampled table rows
(see ``sampling/pallas_sampler.py`` module docstring) so heavy-tail
datasets stay on this path.  TPU-only (on-core PRNG); callers fall back
to the two-pass path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pragma: no cover - off-TPU fallback
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False

from graph_transformer_tpu.ops.pallas_u2gnn import (
    _bwd_rule_hybrid,
    _bwd_rule_mega,
    _fwd_kernel,
    _params_at,
    _seed_layer,
    _stacked_param_specs,
)
from graph_transformer_tpu.ops.pallas_encoder import tile_rows
from graph_transformer_tpu.ops.pallas_ffn import _seed_arr
from graph_transformer_tpu.sampling.pallas_sampler import TABLE_WIDTH

__all__ = [
    "build_tag_table",
    "dataset_codebook",
    "dataset_tags",
    "fused_u2gnn_encoder_sampled",
    "setup_fused_tables",
]


def dataset_tags(node_feat: np.ndarray) -> np.ndarray | None:
    """[N] int32 tag per node when features are exactly one-hot rows;
    None otherwise (the fused path then doesn't apply)."""
    f = np.asarray(node_feat)
    if f.ndim != 2 or f.shape[1] > TABLE_WIDTH:
        return None
    is01 = np.isin(f, (0.0, 1.0)).all()
    if not is01 or not np.all(f.sum(axis=1) == 1.0):
        return None
    return f.argmax(axis=1).astype(np.int32)


def dataset_codebook(
    node_feat: np.ndarray, max_codes: int = TABLE_WIDTH
) -> tuple[np.ndarray, np.ndarray] | None:
    """(tags [N] i32, codebook [n_codes, D] f32) when the feature rows take
    at most ``max_codes`` distinct values — covers one-hot tag datasets
    (TU), the REDDIT ×0.01 constant rule (1 code), and degree-one-hots.
    The kernel reconstructs features as ``onehot(tag) @ codebook``.
    None when features are genuinely continuous (fused path not applicable).
    """
    f = np.asarray(node_feat, np.float32)
    if f.ndim != 2:
        return None
    codes, tags = np.unique(f, axis=0, return_inverse=True)
    if codes.shape[0] > max_codes:
        return None
    return tags.astype(np.int32), codes.astype(np.float32)


def build_tag_table(
    neighbor_table: np.ndarray, tags: np.ndarray
) -> np.ndarray:
    """[N, 128] int32 — the neighbor table with every id replaced by that
    neighbor's tag (pre-gathered once at dataset load; the per-step lane
    gather then yields neighbor *features* directly)."""
    return tags[neighbor_table].astype(np.int32)


def fused_gate_ok(cfg_model) -> bool:
    """Static config part of the fused-path gate (shared by SupTrainer and
    TenfoldVmapRunner; the dataset part is ``setup_fused_tables``)."""
    return (
        cfg_model.use_fused_sampler
        and cfg_model.use_pallas
        and cfg_model.use_pallas_whole_encoder
        and cfg_model.num_hidden_layers == 1
        and cfg_model.recurrence == "basic"
        and cfg_model.num_heads == 1
        and cfg_model.attention_axis == "neighborhood"
    )


def setup_fused_tables(node_feat, neighbor_table: np.ndarray):
    """(tag_table [N,128] i32, tags [N] i32, codebook [C,D] f32) when the
    dataset's features factor through a ≤128-row codebook; None otherwise."""
    cb = dataset_codebook(node_feat)
    if cb is None:
        return None
    tags, codebook = cb
    return build_tag_table(neighbor_table, tags), tags, codebook


def _sampled_fwd_kernel(seed_ref, tag_rows_ref, deg_ref, self_tag_ref,
                        code_ref, *refs, S, rate, T, stored):
    param_refs = refs[:12]
    out_ref = refs[12]
    x0_ref = refs[13]
    saved_refs = refs[14:]  # T-1 layer-input outputs
    i = pl.program_id(0)
    G = tag_rows_ref.shape[0]

    # ---- sample neighbor tags (stream T·n_tiles + i; see module docstring)
    pltpu.prng_seed(seed_ref[0, 0] + T * pl.num_programs(0) + i)
    bits = pltpu.bitcast(
        pltpu.prng_random_bits(tag_rows_ref.shape), jnp.uint32
    )
    u = (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    # hub clamp: rows with deg > 128 hold a uniform 128-subsample
    # (sampling/pallas_sampler.py module docstring)
    deg = jnp.clip(deg_ref[:], 1, TABLE_WIDTH).astype(jnp.float32)  # [G, 1]
    idx = jnp.minimum(jnp.floor(u * deg), deg - 1.0).astype(jnp.int32)
    tags = jnp.take_along_axis(tag_rows_ref[:], idx, axis=1)  # [G, 128]

    # ---- build the [R, D] layer-0 input in VMEM: onehot(tag) @ codebook.
    # The one-hot is built in [G, S, n_codes] and collapsed over the
    # leading dims (last dim intact — the only reshape Mosaic's vector
    # layout supports here; a [G, S] -> [G*S, 1] cast is rejected).
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
    # Round-trip through the saved dtype: the backward replays layer 0
    # from the bf16-saved x0, and the two-pass path's x_global is stored
    # bf16 — the forward must consume the SAME rounded values (codebooks
    # like the REDDIT 0.01 constant are not bf16-exact).
    x = x.astype(x0_ref.dtype)
    x0_ref[:] = x
    x = x.astype(jnp.float32)

    # ---- T-layer mega forward (same body as _fwd_kernel)
    mm = jnp.bfloat16 if x0_ref.dtype == jnp.bfloat16 else jnp.float32
    from graph_transformer_tpu.ops.pallas_u2gnn import _layer_fwd

    h = x
    for t in range(T):
        if t > 0:
            saved_refs[t - 1][:] = h.astype(saved_refs[t - 1].dtype)
        if rate > 0.0:
            _seed_layer(seed_ref, i, t, T)
        h = _layer_fwd(h, _params_at(param_refs, t, stored), S=S, rate=rate,
                       slot0_only=(t == T - 1), want_residuals=False,
                       mm_dtype=mm)
    out_ref[:] = h.astype(out_ref.dtype)


def _sampled_fwd_call(tag_rows, deg, self_tag, codebook, params, seed, S, T,
                      rate, tile_target, x_dtype, interpret):
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
    out_specs = [
        pl.BlockSpec((G, D), lambda i: (i, 0)),       # slot-0 out
        pl.BlockSpec((R, D), lambda i: (i, 0)),       # built x0
    ] + [pl.BlockSpec((R, D), lambda i: (i, 0)) for _ in range(n_saved)]
    out_shape = [
        jax.ShapeDtypeStruct((n_pad, D), jnp.float32),
        jax.ShapeDtypeStruct((rows_pad, D), x_dtype),
    ] + [jax.ShapeDtypeStruct((rows_pad, D), x_dtype)
         for _ in range(n_saved)]
    outs = pl.pallas_call(
        functools.partial(_sampled_fwd_kernel, S=S, rate=rate, T=T,
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
    out, x0, saved = outs[0], outs[1], outs[2:]
    return out[:n], x0, tuple(saved)


def _full_spec2(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def fused_u2gnn_encoder_sampled(tag_rows, deg, self_tag, codebook, params,
                                seed, seq_len: int, num_timesteps: int,
                                rate: float = 0.0, tile_target: int = 512,
                                interpret: bool = False,
                                mega_bwd: bool = False):
    """Sample + build codebook features + T-layer encoder in one kernel.

    ``tag_rows`` [N, 128] i32 (``build_tag_table``), ``deg`` [N, 1] i32,
    ``self_tag`` [N, 1] i32, ``codebook`` [n_codes, D] f32
    (``dataset_codebook``; features reconstruct as onehot(tag)@codebook),
    ``params`` the 12 stacked arrays of ``fused_u2gnn_encoder``, ``seed``
    int32 (REQUIRED: drives both the neighbor sampling and dropout).
    Returns slot-0 rows [N, D] f32.
    """
    out, _, _ = _sampled_fwd_call(
        tag_rows, deg, self_tag, codebook, params, seed, seq_len,
        num_timesteps, rate, tile_target, jnp.bfloat16, interpret,
    )
    return out


def _sampled_fwd_rule(tag_rows, deg, self_tag, codebook, params, seed, S, T,
                      rate, tile_target, interpret, mega_bwd):
    out, x0, saved = _sampled_fwd_call(
        tag_rows, deg, self_tag, codebook, params, seed, S, T, rate,
        tile_target, jnp.bfloat16, interpret,
    )
    shapes = (tag_rows.shape, deg.shape, self_tag.shape)
    return out, (x0, params, seed, saved, shapes, codebook.shape)


def _sampled_bwd_rule(S, T, rate, tile_target, interpret, mega_bwd, res,
                      dout):
    x0, params, seed, saved, shapes, code_shape = res
    rule = _bwd_rule_mega if mega_bwd else _bwd_rule_hybrid
    # x0 is already tile-padded; the hybrid rule re-pads (no-op) and
    # returns (dx, dparams, dseed) — dx is discarded (inputs are data;
    # the int inputs take float0 zero cotangents, the codebook a zero
    # cotangent: it is dataset constants, not trainable).
    _, dparams, _ = rule(S, T, rate, tile_target, interpret,
                         (x0, params, seed, saved), dout)
    ct_int = lambda s: np.zeros(s, jax.dtypes.float0)
    return (ct_int(shapes[0]), ct_int(shapes[1]), ct_int(shapes[2]),
            jnp.zeros(code_shape, jnp.float32),
            dparams, np.zeros(np.shape(seed), jax.dtypes.float0))


fused_u2gnn_encoder_sampled.defvjp(_sampled_fwd_rule, _sampled_bwd_rule)
