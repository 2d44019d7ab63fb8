from graph_transformer_tpu.parallel.edge_partition import (
    HaloPlan,
    build_halo_plan,
    halo_cost_model,
    halo_gather,
    init_halo_unsup_params,
    make_halo_train_step,
    make_shard_map_train_step,
    partition_graphs_by_edges,
)
from graph_transformer_tpu.parallel.mesh import make_mesh, mesh_shape_for
from graph_transformer_tpu.parallel.spmd import (
    batch_pspec,
    param_pspec,
    shard_batch,
    shard_params,
    make_spmd_train_step,
)

__all__ = [
    "HaloPlan",
    "build_halo_plan",
    "halo_cost_model",
    "halo_gather",
    "init_halo_unsup_params",
    "make_halo_train_step",
    "make_shard_map_train_step",
    "partition_graphs_by_edges",
    "make_mesh",
    "mesh_shape_for",
    "batch_pspec",
    "param_pspec",
    "shard_batch",
    "shard_params",
    "make_spmd_train_step",
]
