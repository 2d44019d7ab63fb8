"""Edge-partitioned DP scaling-efficiency harness.

Measures edges/s of the explicit shard_map train step at 1, 2, 4, ... shards
and reports scaling efficiency (the BASELINE target: ≥80% at 2+ hosts).

Only one real TPU chip is reachable from this container, so by default this
runs on the virtual CPU mesh (``--xla_force_host_platform_device_count``) —
that validates the partitioning/collective machinery and the efficiency
*methodology*; absolute numbers come from the single-chip bench.  On a real
multi-chip slice the same script runs unchanged (drop the env override).

Run: python scripts/bench_scaling.py [--devices 8] [--graphs-per-shard 8]

Multi-process mode (``--multiprocess N``): forks N OS processes that join
one ``jax.distributed`` cluster (``parallel/bootstrap.py``) and run the same
shard_map step over the *global* mesh — the per-host launcher a TPU pod
uses, rehearsed as a local CPU cluster.  On a real pod, run this script once
per host with GT_COORDINATOR/GT_NUM_PROCESSES/GT_PROCESS_ID set instead.
"""

import argparse
import os
import socket
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _launch_multiprocess(args) -> int:
    """Fork N cluster processes of this script; return max exit code."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    argv, skip = [], False
    for a in sys.argv:
        if skip:
            skip = False
            continue
        if a == "--multiprocess":
            skip = True  # drop the separate value token too
            continue
        if a.startswith("--multiprocess="):
            continue
        argv.append(a)
    for pid in range(args.multiprocess):
        env = dict(
            os.environ,
            PALLAS_AXON_POOL_IPS="",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=(
                f"--xla_force_host_platform_device_count={args.local_devices}"
            ),
            GT_COORDINATOR=f"127.0.0.1:{port}",
            GT_NUM_PROCESSES=str(args.multiprocess),
            GT_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen([sys.executable] + argv, env=env))
    return max(p.wait() for p in procs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--graphs-per-shard", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--ff", type=int, default=256)
    ap.add_argument("--cpu-mesh", action="store_true", default=None,
                    help="force the virtual CPU mesh (default: auto)")
    ap.add_argument("--multiprocess", type=int, default=0,
                    help="fork N processes forming one jax.distributed "
                    "cluster and bench over the global mesh")
    ap.add_argument("--local-devices", type=int, default=2,
                    help="virtual CPU devices per process in --multiprocess")
    args = ap.parse_args()

    if args.multiprocess and "GT_PROCESS_ID" not in os.environ:
        sys.exit(_launch_multiprocess(args))

    import jax

    in_cluster = "GT_PROCESS_ID" in os.environ
    if in_cluster:
        from graph_transformer_tpu.parallel.bootstrap import initialize_from_env

        initialize_from_env()
    elif args.cpu_mesh is not False and jax.default_backend() != "tpu" or (
        jax.default_backend() == "tpu" and len(jax.devices()) < 2
    ):
        # single-chip or no TPU: fall back to the virtual CPU mesh
        if jax.device_count() < args.devices:
            print(
                f"# only {jax.device_count()} devices visible; re-exec with "
                f"virtual CPU mesh"
            )
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={args.devices}"
            )
            os.environ["JAX_PLATFORMS"] = "cpu"
            os.environ.pop("PALLAS_AXON_POOL_IPS", None)
            os.execv(sys.executable, [sys.executable] + sys.argv + ["--cpu-mesh"])

    import jax.numpy as jnp
    import numpy as np

    from graph_transformer_tpu.config import ModelConfig
    from graph_transformer_tpu.data.tu import synthetic_powerlaw_dataset
    from graph_transformer_tpu.models.u2gnn_sup import U2GNNSup
    from graph_transformer_tpu.ops.losses import label_smoothing
    from graph_transformer_tpu.parallel.edge_partition import (
        ShardedBatchBuilder,
        make_shard_map_train_step,
    )
    from graph_transformer_tpu.parallel.mesh import make_mesh
    from graph_transformer_tpu.train.optim import make_optimizer

    ds = synthetic_powerlaw_dataset(num_graphs=256, mean_nodes=200, seed=0)
    cfg = ModelConfig(num_timesteps=2, num_hidden_layers=1,
                      ff_hidden_size=args.ff)
    model = U2GNNSup(ds.feature_dim, ds.num_classes, cfg)

    def loss_fn(p, local, key):
        scores = model.apply(p, local, rng=None)
        t = label_smoothing(local.labels, ds.num_classes, 0.1)
        return -jnp.sum(t * jax.nn.log_softmax(scores, axis=-1))

    results = {}
    if in_cluster:
        # one measurement over the whole multi-process mesh; the gradient
        # psum crosses the process boundary (gRPC locally, DCN on a pod)
        shard_counts = [jax.device_count()]
    else:
        n = 1
        shard_counts = []
        while n <= min(args.devices, jax.device_count()):
            shard_counts.append(n)
            n *= 2
    for n_shards in shard_counts:
        if in_cluster:
            from graph_transformer_tpu.parallel.bootstrap import make_global_mesh

            mesh = make_global_mesh(model_parallel=1)
        else:
            mesh = make_mesh(
                model_parallel=1, devices=jax.devices()[:n_shards]
            )
        sb = ShardedBatchBuilder(
            ds, n_shards, batch_size=args.graphs_per_shard,
            num_neighbors=8, pad_multiple=128, seed=0,
        )
        stacked = sb.sample()
        edges = float(np.asarray(stacked.edge_mask).sum())
        params = model.init(jax.random.key(0))
        opt = make_optimizer(1e-3)
        opt_state = opt.init(params)
        if in_cluster:
            from jax.sharding import PartitionSpec as P

            from graph_transformer_tpu.parallel.bootstrap import put_tree

            params = put_tree(
                params, mesh, jax.tree_util.tree_map(lambda _: P(), params)
            )
            opt_state = put_tree(
                opt_state,
                mesh,
                jax.tree_util.tree_map(lambda _: P(), opt_state),
            )
            stacked = put_tree(
                stacked,
                mesh,
                jax.tree_util.tree_map(lambda _: P("data"), stacked),
            )
        step = make_shard_map_train_step(loss_fn, opt, mesh, donate=False)
        key = jax.random.key(1)
        with mesh:
            for _ in range(3):
                params, opt_state, loss = step(params, opt_state, stacked, key)
            jax.block_until_ready(loss)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                params, opt_state, loss = step(params, opt_state, stacked, key)
            jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / args.steps
        eps = edges / dt
        results[n_shards] = eps
        base = results[shard_counts[0]]
        eff = eps / (base * n_shards / shard_counts[0])
        if not in_cluster or jax.process_index() == 0:
            tag = (
                f"procs={jax.process_count()} " if in_cluster else ""
            )
            print(
                f"{tag}shards={n_shards:2d} | {dt*1e3:8.2f} ms/step | "
                f"{eps/1e6:8.2f}M edges/s | scaling eff {eff*100:5.1f}%",
                flush=True,
            )


if __name__ == "__main__":
    main()
