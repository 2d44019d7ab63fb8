"""graph_transformer_tpu — a TPU-native graph-transformer (U2GNN-family) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
shaginhekvs/Graph-Transformer research fork (U2GNN: "Universal Self-Attention
Network for Graph Classification", arXiv:1909.11855):

- fixed-fanout neighborhood sampling as padded index gathers (host numpy or
  fully on-device via ``jax.random``),
- a transformer self-attention aggregator over sampled neighborhoods
  (XLA path + fused Pallas kernel),
- a pure-JAX log-uniform sampled softmax replacing the reference's C++/Cython
  ``LogUniformSampler`` extension,
- GCN / GAT baselines on a shared sparse gather/scatter substrate,
- multiplex (multilayer) graph models with cross-layer attention,
- SPMD data/edge parallelism over ``jax.sharding.Mesh``.

Everything under ``jit`` uses static shapes: ragged graph batches are padded to
bucketed sizes at the data layer (see ``data.batching``).
"""

__version__ = "0.1.0"

from graph_transformer_tpu.config import (  # noqa: F401
    DataConfig,
    ModelConfig,
    TrainConfig,
    ExperimentConfig,
)
