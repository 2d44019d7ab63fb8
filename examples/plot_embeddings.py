"""Train unsupervised node embeddings and project them to 2-D.

The ``read_plot_embeddings.ipynb`` analogue: train the unsupervised U2GNN on
a TU dataset for a few epochs, pool node embeddings to graph level, project
with PCA (and t-SNE when sklearn has it), and either save a scatter plot
(when matplotlib is available) or print per-class centroid separation.

Run on CPU:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/plot_embeddings.py
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np

from graph_transformer_tpu.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from graph_transformer_tpu.data.tu import load_tu_dataset
from graph_transformer_tpu.train.evaluate import pool_node_embeddings
from graph_transformer_tpu.train.unsup_trainer import UnsupTrainer


def main():
    ds = load_tu_dataset("MUTAG")
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=16, num_neighbors=4),
        model=ModelConfig(num_timesteps=1, num_hidden_layers=2,
                          ff_hidden_size=64, sampled_num=64),
        train=TrainConfig(num_epochs=5, learning_rate=1e-4),
    )
    trainer = UnsupTrainer(ds, cfg)
    for epoch in range(cfg.train.num_epochs):
        loss = trainer.train_epoch()
        print(f"epoch {epoch + 1}: loss {loss:.2f}")

    node_emb = np.asarray(trainer.model.node_embeddings(trainer.params))
    graph_emb = pool_node_embeddings(node_emb, ds.graph_offsets)
    print(f"graph embeddings: {graph_emb.shape}")

    # PCA to 2-D
    x = graph_emb - graph_emb.mean(0)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    xy = x @ vt[:2].T
    for c in range(ds.num_classes):
        mu = xy[ds.labels == c].mean(0)
        print(f"class {c}: {np.sum(ds.labels == c)} graphs, "
              f"PCA centroid ({mu[0]:+.3f}, {mu[1]:+.3f})")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 5))
        for c in range(ds.num_classes):
            m = ds.labels == c
            ax.scatter(xy[m, 0], xy[m, 1], s=12, label=f"class {c}")
        ax.legend()
        ax.set_title(f"{ds.name} unsupervised graph embeddings (PCA)")
        fig.savefig("embeddings_pca.png", dpi=120, bbox_inches="tight")
        print("saved embeddings_pca.png")
    except Exception as e:  # matplotlib optional
        print(f"(no plot: {e})")


if __name__ == "__main__":
    main()
