from graph_transformer_tpu.utils.metrics import (
    purity,
    clustering_accuracy,
    clustering_error_majority,
    nmi,
    ari,
    spectral_eval_from_laplacian,
    eval_from_embeddings,
)
from graph_transformer_tpu.utils.laplacian import (
    unnormalized_laplacian,
    arithmetic_mean_laplacian,
    geometric_mean_laplacian,
)

__all__ = [
    "purity",
    "clustering_accuracy",
    "clustering_error_majority",
    "nmi",
    "ari",
    "spectral_eval_from_laplacian",
    "eval_from_embeddings",
    "unnormalized_laplacian",
    "arithmetic_mean_laplacian",
    "geometric_mean_laplacian",
]
