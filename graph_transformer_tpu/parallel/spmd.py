"""GSPMD sharding of batches, parameters, and the train step.

The scaling recipe is the standard one: pick a mesh, annotate input/parameter
shardings, jit — XLA inserts the collectives.  Graph batches shard along the
**node/edge axis** (the axis that actually gets long for REDDIT-scale data,
SURVEY.md §5): the block-diagonal batch graph is laid out graph-contiguously
by the batch builder, so a node-axis shard owns whole graphs and the
neighborhood gather (``x[neigh]``) is shard-local for balanced batches; the
graph pool's cross-shard segment-sum and the gradient all-reduce ride the
``data`` axis.  Feed-forward weights (the only large matrices: D×F with
F=1024) shard along ``model``.

Parameter pytrees are plain dataclasses of arrays, so sharding trees are
built structurally: any leaf whose trailing dims match (D, F) / (F, D) or
(F,) patterns gets the model-parallel spec; everything else is replicated.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graph_transformer_tpu.data.batching import GraphBatch


# --------------------------------------------------------------------- specs
def batch_pspec() -> GraphBatch:
    """PartitionSpec tree for a GraphBatch: node/edge axes over 'data'."""
    return GraphBatch(
        x=P("data", None),
        neigh=P("data", None),
        graph_id=P("data"),
        node_gidx=P("data"),
        node_mask=P("data"),
        edge_src=P("data"),
        edge_dst=P("data"),
        edge_mask=P("data"),
        labels=P(),  # tiny; replicated
    )


def param_pspec(params: Any, ff_hidden: int) -> Any:
    """Model-parallel spec tree: shard every ff_hidden-sized dim over 'model'.

    Covers ``w_ff1 [T, D, F]`` → (None, None, 'model'), ``w_ff2 [T, F, D]`` →
    (None, 'model', None), ``b_ff1 [T, F]`` → (None, 'model'), and the
    sampled-softmax vocab table ``[V, D]`` stays replicated (V is sharded by
    the data axis activations instead).  Everything else replicates.
    """

    def spec_for(leaf):
        shape = jnp.shape(leaf)
        dims = [("model" if d == ff_hidden else None) for d in shape]
        if any(dims):
            return P(*dims)
        return P()

    return jax.tree_util.tree_map(spec_for, params)


# ------------------------------------------------------------------ placement
def shard_batch(batch: GraphBatch, mesh: Mesh) -> GraphBatch:
    spec = batch_pspec()
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), batch, spec
    )


def shard_params(params: Any, mesh: Mesh, ff_hidden: int) -> Any:
    spec = param_pspec(params, ff_hidden)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, spec
    )


# ------------------------------------------------------------------ train step
def make_spmd_train_step(
    loss_fn: Callable,  # (params, batch, key) -> scalar loss
    opt,
    mesh: Mesh,
    ff_hidden: int,
    params_example: Any,
    donate: bool = True,
):
    """Build a jitted SPMD train step with explicit in/out shardings.

    ``loss_fn`` must be pure (all model state in ``params``).  Gradient
    reduction across the data axis falls out of GSPMD: the loss is a global
    scalar, so d loss / d params is automatically all-reduced.
    """
    pspec = param_pspec(params_example, ff_hidden)
    pshard = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), pspec)
    bshard = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), batch_pspec()
    )
    rep = NamedSharding(mesh, P())

    def step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(pshard, None, bshard, rep),
        out_shardings=(pshard, None, rep),
        donate_argnums=(0, 1) if donate else (),
    )
