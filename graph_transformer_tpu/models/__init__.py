from graph_transformer_tpu.models.u2gnn_sup import U2GNNSup, U2GNNSupParams
from graph_transformer_tpu.models.u2gnn_unsup import U2GNNUnsup, U2GNNUnsupParams
from graph_transformer_tpu.models.gcn import GCNModel, GCNParams
from graph_transformer_tpu.models.gat import GATModel, GATParams
from graph_transformer_tpu.models.multilayer import MultilayerU2GNN, MultilayerParams

__all__ = [
    "U2GNNSup",
    "U2GNNSupParams",
    "U2GNNUnsup",
    "U2GNNUnsupParams",
    "GCNModel",
    "GCNParams",
    "GATModel",
    "GATParams",
    "MultilayerU2GNN",
    "MultilayerParams",
]
