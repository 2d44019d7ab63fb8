from graph_transformer_tpu.data.tu import GraphDataset, load_tu_dataset, synthetic_powerlaw_dataset
from graph_transformer_tpu.data.batching import GraphBatch, BatchBuilder, pad_to_multiple
from graph_transformer_tpu.data.splits import stratified_kfold_indices, separate_data_idx
from graph_transformer_tpu.data.citation import (
    NodeGraphDataset,
    load_node_dataset,
    from_arrays,
    load_npz,
)

__all__ = [
    "GraphDataset",
    "load_tu_dataset",
    "synthetic_powerlaw_dataset",
    "GraphBatch",
    "BatchBuilder",
    "pad_to_multiple",
    "stratified_kfold_indices",
    "separate_data_idx",
    "NodeGraphDataset",
    "load_node_dataset",
    "from_arrays",
    "load_npz",
]
