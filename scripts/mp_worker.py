"""Multi-process worker: one process of a ``jax.distributed`` CPU cluster.

Spawned by ``tests/test_multiprocess.py`` and by
``scripts/bench_scaling.py --multiprocess N``.  Each process contributes
``--xla_force_host_platform_device_count`` local CPU devices; the GSPMD
train step (``parallel/spmd.py``) then runs over the *global* mesh exactly
as it would over a multi-host TPU slice — same code, same collectives,
gradient all-reduce crossing the process boundary (gRPC here, DCN there).

The trial is deterministic (fixed seeds, dropout key built inside the jitted
step), so every process must report the identical loss sequence, and a
single-process run of :func:`run_trial` must reproduce it bit-for-bit up to
reduction order.
"""

from __future__ import annotations

import json
import os
import sys

# env must be pinned before jax import (the axon sitecustomize registers a
# TPU backend whenever PALLAS_AXON_POOL_IPS is set)
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_trial(mesh, n_steps: int = 3):
    """Seeded GSPMD training trial on ``mesh``; returns the loss list.

    Mirrors ``__graft_entry__.dryrun_multichip`` regime 1, but with the
    dropout key constructed inside the jitted step so the trial needs no
    host-side PRNG arrays (multi-process-safe).
    """
    import jax
    import jax.numpy as jnp

    from graph_transformer_tpu.config import ModelConfig
    from graph_transformer_tpu.data.batching import BatchBuilder
    from graph_transformer_tpu.data.tu import synthetic_powerlaw_dataset
    from graph_transformer_tpu.models.u2gnn_sup import U2GNNSup
    from graph_transformer_tpu.ops.losses import label_smoothing, soft_cross_entropy
    from graph_transformer_tpu.parallel.bootstrap import put_tree
    from graph_transformer_tpu.parallel.spmd import batch_pspec, param_pspec
    from graph_transformer_tpu.train.optim import make_optimizer
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_devices = mesh.devices.size
    ds = synthetic_powerlaw_dataset(num_graphs=16, mean_nodes=24, seed=0)
    B, K, FF = 8, 4, 64
    builder = BatchBuilder(
        ds, batch_size=B, num_neighbors=K, pad_multiple=8 * n_devices, seed=0
    )
    batch = builder.build(list(range(B)))

    cfg = ModelConfig(num_timesteps=2, num_hidden_layers=2, ff_hidden_size=FF)
    model = U2GNNSup(ds.feature_dim, ds.num_classes, cfg)
    params = model.init(jax.random.key(0))
    opt = make_optimizer(5e-4)
    opt_state = opt.init(params)

    pspec = param_pspec(params, FF)
    params = put_tree(params, mesh, pspec)
    opt_state = put_tree(
        opt_state,
        mesh,
        jax.tree_util.tree_map(lambda _: P(), opt_state),
    )
    batch = put_tree(batch, mesh, batch_pspec())

    pshard = jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), pspec)
    bshard = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), batch_pspec()
    )
    rep = NamedSharding(mesh, P())

    def step(params, opt_state, batch, i):
        key = jax.random.fold_in(jax.random.key(1), i)

        def loss_fn(p):
            s = model.apply(p, batch, rng=key)
            t = label_smoothing(batch.labels, ds.num_classes, 0.1)
            return soft_cross_entropy(s, t)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    step = jax.jit(
        step,
        in_shardings=(pshard, None, bshard, rep),
        out_shardings=(pshard, None, rep),
    )

    losses = []
    for i in range(n_steps):
        params, opt_state, loss = step(
            params, opt_state, batch, put_tree(jnp.asarray(i), mesh, P())
        )
        losses.append(float(loss))  # replicated scalar: addressable everywhere
    return losses


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    import jax

    from graph_transformer_tpu.parallel.bootstrap import (
        initialize_from_env,
        make_global_mesh,
    )

    multi = initialize_from_env()
    mesh = make_global_mesh(model_parallel=1)
    losses = run_trial(mesh, args.steps)
    rec = {
        "multi": multi,
        "process_id": jax.process_index(),
        "process_count": jax.process_count(),
        "device_count": jax.device_count(),
        "local_device_count": jax.local_device_count(),
        "losses": losses,
    }
    with open(args.out, "w") as f:
        json.dump(rec, f)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
