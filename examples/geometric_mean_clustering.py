"""Multilayer spectral clustering: arithmetic vs geometric mean of Laplacians.

The ``code_m/Multilayer_GeometricMean.ipynb`` analogue: build a multiplex
graph, cluster nodes from the spectrum of (a) the arithmetic mean of the
per-view Laplacians and (b) the Riemannian (Karcher/geometric) mean of the
regularized Laplacians (``util.py:43-52`` via pyriemann in the reference;
here a self-contained fixed-point iteration,
``utils/laplacian.py:geometric_mean_laplacian``), and report the clustering
metrics for both.

Run on CPU:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/geometric_mean_clustering.py
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from graph_transformer_tpu.data.multiplex import gaussian_multiplex
from graph_transformer_tpu.utils.laplacian import (
    arithmetic_mean_laplacian,
    geometric_mean_laplacian,
)
from graph_transformer_tpu.utils.metrics import spectral_eval_from_laplacian


def main():
    ds = gaussian_multiplex(size_x=8, seed=100)
    print(f"multiplex: {ds.num_nodes} nodes, {ds.num_views} views, "
          f"{ds.num_classes} classes")

    am = arithmetic_mean_laplacian(ds.lap)
    gm = geometric_mean_laplacian(ds.lap)
    for name, lap in [("arithmetic", am), ("geometric", gm)]:
        m = spectral_eval_from_laplacian(lap, ds.labels, ds.num_classes)
        print(f"{name:>10} mean Laplacian: " +
              ", ".join(f"{k}={v:.4f}" for k, v in sorted(m.items())))


if __name__ == "__main__":
    main()
