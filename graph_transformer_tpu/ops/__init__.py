from graph_transformer_tpu.ops.sparse import (
    graph_sum_pool,
    spmm,
    gcn_norm_edges,
    edge_softmax,
)
from graph_transformer_tpu.ops.attention import (
    TransformerEncoderParams,
    init_encoder_params,
    transformer_encoder,
    neighborhood_encoder,
)
from graph_transformer_tpu.ops.sampled_softmax import SampledSoftmaxParams, sampled_softmax_loss
from graph_transformer_tpu.ops.ut_recurrence import init_recurrence_params, act_encoder
from graph_transformer_tpu.ops.losses import (
    label_smoothing,
    soft_cross_entropy,
    supcon_loss,
    gae_loss,
)

__all__ = [
    "graph_sum_pool",
    "spmm",
    "gcn_norm_edges",
    "edge_softmax",
    "TransformerEncoderParams",
    "init_encoder_params",
    "transformer_encoder",
    "neighborhood_encoder",
    "SampledSoftmaxParams",
    "sampled_softmax_loss",
    "label_smoothing",
    "soft_cross_entropy",
    "supcon_loss",
    "gae_loss",
    "init_recurrence_params",
    "act_encoder",
]
