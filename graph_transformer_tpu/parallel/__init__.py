from graph_transformer_tpu.parallel.mesh import make_mesh, mesh_shape_for
from graph_transformer_tpu.parallel.spmd import (
    batch_pspec,
    param_pspec,
    shard_batch,
    shard_params,
    make_spmd_train_step,
)

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "batch_pspec",
    "param_pspec",
    "shard_batch",
    "shard_params",
    "make_spmd_train_step",
]
