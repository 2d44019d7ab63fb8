"""Component walkthrough — the ``learn_about_components.ipynb`` analogue.

The reference's 85-cell notebook steps interactively through loader →
graph_pool → Batch_Loader → model forward → SampledSoftmax (it doubles as
the repo's only integration test).  This script walks the same path through
the TPU-native framework, printing the shape/content of every intermediate,
so a new user can see how the pieces fit.

Run on CPU:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/walkthrough.py
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np
import jax
import jax.numpy as jnp

from graph_transformer_tpu.config import ModelConfig
from graph_transformer_tpu.data.batching import BatchBuilder
from graph_transformer_tpu.data.tu import load_tu_dataset
from graph_transformer_tpu.models.u2gnn_sup import U2GNNSup
from graph_transformer_tpu.models.u2gnn_unsup import U2GNNUnsup
from graph_transformer_tpu.ops.sampled_softmax import sampled_softmax_loss
from graph_transformer_tpu.ops.sparse import graph_sum_pool
from graph_transformer_tpu.sampling.log_uniform import (
    LogUniformSpec,
    log_uniform_probs,
)


def main():
    # ------------------------------------------------------------- 1. data
    # TU text format -> flat struct-of-arrays (global CSR + graph ranges);
    # the reference's S2VGraph list (util.py:18-34) becomes columnar arrays.
    ds = load_tu_dataset("MUTAG")
    print(f"dataset: {ds.name}: {ds.num_graphs} graphs, {ds.num_nodes} nodes, "
          f"{ds.num_directed_edges} directed edges, "
          f"feature dim {ds.feature_dim}, {ds.num_classes} classes")
    print(f"  first graph: nodes [{ds.graph_offsets[0]}, {ds.graph_offsets[1]}), "
          f"label {ds.labels[0]}")
    print(f"  node 0 neighbors: {ds.nbr_ids[ds.nbr_offsets[0]:ds.nbr_offsets[1]]}")

    # ---------------------------------------------------------- 2. batching
    # One padded, static-shape batch (replaces get_batch_data +
    # the torch.sparse graph_pool, train_pytorch_U2GNN_Sup.py:58-119).
    builder = BatchBuilder(ds, batch_size=4, num_neighbors=8, seed=0)
    batch = builder.build([0, 1, 2, 3])
    print(f"\nbatch: x {batch.x.shape}, neigh {batch.neigh.shape} "
          f"(slot 0 = self), graph_id {batch.graph_id.shape}, "
          f"{int(batch.node_mask.sum())} real nodes, "
          f"{int(batch.edge_mask.sum())} real edges")
    print(f"  neighborhood of node 0: {np.asarray(batch.neigh[0])}")

    # sum-pooling = segment_sum over graph ids (replaces the spmm pool)
    pooled = graph_sum_pool(jnp.asarray(batch.x), jnp.asarray(batch.graph_id), 4)
    print(f"  graph sum-pool: {pooled.shape}")

    # ------------------------------------------------- 3. supervised model
    cfg = ModelConfig(num_timesteps=2, num_hidden_layers=2, ff_hidden_size=64)
    model = U2GNNSup(ds.feature_dim, ds.num_classes, cfg)
    params = model.init(jax.random.key(0))
    scores = model.apply(params, batch, rng=None)
    print(f"\nU2GNN-Sup scores: {scores.shape} "
          f"(sum of per-layer heads, pytorch_U2GNN_Sup.py:42-44)")

    # ------------------------------------------- 4. log-uniform + sampled SM
    spec = LogUniformSpec.create(ds.num_nodes, 64)
    probs = log_uniform_probs(ds.num_nodes)
    p01 = [float(probs[k]) for k in (0, 1, 100)]
    print(f"\nlog-uniform P(k): k=0 {p01[0]:.4f}, k=1 {p01[1]:.4f}, "
          f"k=100 {p01[2]:.5f} (Zipf, Log_Uniform_Sampler.cpp:14)")

    ucfg = ModelConfig(num_timesteps=1, num_hidden_layers=2,
                       ff_hidden_size=64, sampled_num=64)
    umodel = U2GNNUnsup(ds.feature_dim, ds.num_nodes, ucfg)
    uparams = umodel.init(jax.random.key(1))
    z = umodel.encode(uparams, batch, rng=None)
    print(f"U2GNN-UnSup embedding: {z.shape} "
          f"(k layer outputs concatenated, model_U2GNN_Unsup_multi.py:48)")
    per_node = sampled_softmax_loss(
        uparams.ss, jax.random.key(2), z, batch.node_gidx, spec,
        mask=batch.node_mask)
    print(f"sampled-softmax per-node loss: {per_node.shape}, "
          f"sum {float(jnp.sum(per_node)):.2f}")


if __name__ == "__main__":
    main()
