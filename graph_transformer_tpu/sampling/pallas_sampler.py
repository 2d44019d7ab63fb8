"""Pallas neighborhood sampler: per-step fanout sampling without XLA gathers.

Round-3 profile (v5e, bench shapes, scripts/profile_focus.py +
/tmp probes recorded in BASELINE.md): the XLA sampling path costs
~1.3 ms/step — randint 0.26 ms, the CSR neighbor gather 0.77 ms, the
global→local scatter+gather 0.79 ms — because XLA's TPU gather of ~70K
narrow elements runs at ~11 µs per 1K elements regardless of formulation
(row gather, take_along_axis, flat).  The only fast gather primitive on
this hardware is the in-register lane gather (``tpu.DynamicGatherOp``),
which Mosaic exposes for ``jnp.take_along_axis(x, idx, axis=1)`` with
``idx.shape == x.shape`` and lane count ≤ 128.

So: pre-pad each node's neighbor list to a 128-wide table row (tiled —
entry ``c`` is ``nbr_ids[offset + c % deg]``, self for isolated nodes),
keep the table in HBM, and sample in ONE kernel pass per step:

    bits  = on-core PRNG                [tile, 128] u32
    idx   = floor(bits/2^32 * deg)      (float-scaled: no integer divide)
    out   = take_along_axis(row, idx)   lane gather

Only columns [0, K) of the output are consumed.  Sampling semantics match
``sample_neighborhoods`` (uniform with replacement over the full neighbor
list, self-fill for isolated nodes — ``train_pytorch_U2GNN_Sup.py:107-113``);
the RNG stream differs (TPU PRNG vs threefry) and the float scaling carries
the same O(deg/2^24) rounding bias class as ``jax.random.randint``'s
remainder method.

**Hub nodes (degree > 128, the REDDIT heavy-tail regime).**  The lane
gather is hard-limited to 128 entries, so a hub's table row cannot hold
its full neighbor list.  Instead the row holds a SEEDED UNIFORM
WITH-REPLACEMENT 128-SUBSAMPLE of the list and the kernel clamps the
degree to 128: each draw is then uniform over the subsample, and since
the subsample entries are themselves iid uniform over the true neighbor
list, every draw is marginally uniform over the true list.  What changes
vs the exact semantics is only inter-draw correlation: within one table
refresh, draws for a hub land in its 128-entry subsample (self-correlated
across steps).  Hubs are a vanishing fraction of a power-law graph's
nodes (0.1% on the heavy-tail bench graph).  The subsample is seeded by
``cfg.train.seed`` at trainer construction — one draw per run, fresh
across seeds; ``refresh_hub_rows`` re-draws rows for custom loops — note
the jitted train steps capture the device table at build time, so a
refresh requires rebuilding the step (or passing the table as an
argument).  Measured: heavy-tail bench
variant in ``runs/heavy_tail_bench.json``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu imports off-TPU; kernel then runs with interpret=True
    from jax.experimental.pallas import tpu as pltpu

    _HAVE_PLTPU = True
except Exception:  # pragma: no cover
    _HAVE_PLTPU = False

from graph_transformer_tpu.data.tu import GraphDataset
from graph_transformer_tpu.ops.pallas_ffn import on_tpu

TABLE_WIDTH = 128  # lane-gather width (hard hardware limit)


def build_neighbor_table(
    ds: GraphDataset, hub_seed: int = 0
) -> np.ndarray:
    """[num_nodes, 128] int32 global-id table: row v holds v's neighbor list
    tiled to 128 entries (self for isolated nodes).  Rows whose degree
    exceeds the 128-lane gather width hold a seeded uniform
    with-replacement 128-subsample instead (marginally-uniform draws; see
    module docstring), so the fast path engages on heavy-tail datasets
    (real REDDIT has hub nodes far beyond 128)."""
    deg = ds.degrees
    n = ds.num_nodes
    table = np.empty((n, TABLE_WIDTH), np.int32)
    rng = np.random.default_rng(hub_seed)
    for v in range(n):
        s, e = ds.nbr_offsets[v], ds.nbr_offsets[v + 1]
        if e - s > TABLE_WIDTH:
            table[v] = rng.choice(ds.nbr_ids[s:e], TABLE_WIDTH)
        elif e > s:
            reps = -(-TABLE_WIDTH // (e - s))
            table[v] = np.tile(ds.nbr_ids[s:e], reps)[:TABLE_WIDTH]
        else:
            table[v] = v
    return table


def refresh_hub_rows(
    table: np.ndarray, ds: GraphDataset, seed: int
) -> np.ndarray:
    """Re-draw the 128-subsample rows of hub nodes (degree > 128) in a COPY
    of ``table`` (non-hub rows untouched; no-op when the dataset has no
    hubs).  For custom long-lived loops: the built-in trainers capture
    the device table in their jitted steps at construction (one draw per
    run, seeded by cfg.train.seed), so use this only with re-built or
    table-as-argument steps."""
    hubs = np.flatnonzero(ds.degrees > TABLE_WIDTH)
    if hubs.size == 0:
        return table
    out = table.copy()
    rng = np.random.default_rng(seed)
    for v in hubs:
        s, e = ds.nbr_offsets[v], ds.nbr_offsets[v + 1]
        out[v] = rng.choice(ds.nbr_ids[s:e], TABLE_WIDTH)
    return out


def _sample_kernel(seed_ref, rows_ref, deg_ref, out_ref):
    i = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0, 0] + i)
    bits = pltpu.bitcast(
        pltpu.prng_random_bits(rows_ref.shape), jnp.uint32
    )
    # float-scaled uniform int in [0, deg): keep the top 24 bits so the
    # f32 mantissa holds them exactly (via int32 — Mosaic has no u32→f32)
    u = (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
    # clamp to the table width: hub rows (deg > 128) hold a uniform
    # 128-subsample, and a uniform draw over it is marginally uniform
    # over the true neighbor list (module docstring)
    deg = jnp.clip(deg_ref[:], 1, TABLE_WIDTH).astype(jnp.float32)
    idx = jnp.minimum(
        jnp.floor(u * deg), deg - 1.0
    ).astype(jnp.int32)
    out_ref[:] = jnp.take_along_axis(rows_ref[:], idx, axis=1)


def sample_neighbor_table(
    seed: jax.Array,  # int32 scalar/[1] (traced)
    table_rows: jax.Array,  # [N, 128] int32 (global ids), batch-fixed
    deg: jax.Array,  # [N, 1] int32
    tile: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """One PRNG+lane-gather pass: [N, 128] sampled global neighbor ids
    (each column an independent uniform draw; use the first K)."""
    if interpret is None:
        interpret = not on_tpu()
    n = table_rows.shape[0]
    n_pad = ((n + tile - 1) // tile) * tile
    if n_pad != n:
        table_rows = jnp.pad(table_rows, ((0, n_pad - n), (0, 0)))
        deg = jnp.pad(deg, ((0, n_pad - n), (0, 0)), constant_values=1)
    grid = (n_pad // tile,)
    out = pl.pallas_call(
        _sample_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec((tile, TABLE_WIDTH), lambda i: (i, 0)),
            pl.BlockSpec((tile, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((tile, TABLE_WIDTH), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_pad, TABLE_WIDTH), jnp.int32),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1, 1), table_rows, deg)
    return out[:n]


def resample_batch_neighbors_fast(
    seed: jax.Array,
    table_rows: jax.Array,  # [N_pad, 128] i32 global ids for the batch slots
    deg: jax.Array,  # [N_pad, 1] i32
    node_gidx: jax.Array,  # [N_pad]
    num_neighbors: int,
) -> jax.Array:
    """[N_pad, K+1] fresh *global* neighborhoods, self at slot 0 —
    the fast-path twin of ``neighbors.resample_batch_neighbors`` (which
    returns batch-local ids; here features are gathered globally so no
    global→local remap is needed)."""
    sampled = sample_neighbor_table(seed, table_rows, deg)
    return jnp.concatenate(
        [node_gidx[:, None], sampled[:, :num_neighbors]], axis=1
    )
