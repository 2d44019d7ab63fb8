"""Empirical anchors for the halo cost model (VERDICT round-2 item 7).

``parallel.halo_cost_model`` predicts regime-2 (node-partitioned, halo
boundary-exchange) scaling from collective bytes vs local FLOPs, but had
zero measured points.  This script anchors it with what this container can
measure:

1. **Real chip, S=1** (``--chip``): the regime-2 train step's absolute
   compute time at one shard — pins the model's t_compute term (the model's
   FLOPs / peak-fraction).  No collectives at S=1.
2. **Virtual CPU mesh, S ∈ {1,2,4,8}** (``--virtual``): per-step wall time
   trend + the model's collective-bytes prediction per S.  The 2-core host
   oversubscribes an 8-way mesh, so absolute CPU times are NOT efficiency
   claims; what anchors the model is (a) the measured collective bytes
   scale as (S-1)·H·D per step (verified analytically from the plan) and
   (b) the step-time trend stays within the oversubscription envelope
   (t ∝ total work / 2 cores).

Writes runs/halo_anchor.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STEPS = 50


def make_neigh(n_total, K, graph, seed=0):
    """Neighborhood matrix for the halo plan: 'random' is the worst case
    (every neighborhood crosses shards); 'powerlaw' samples a real
    REDDIT-like dataset's CSR, whose graph-contiguous node order gives
    contiguous shards locality (the realistic regime for edge-partitioned
    batches)."""
    rng = np.random.default_rng(seed)
    if graph == "random":
        neigh = rng.integers(0, n_total, size=(n_total, K + 1)).astype(
            np.int32)
        neigh[:, 0] = np.arange(n_total)
        return neigh
    from graph_transformer_tpu.data.tu import synthetic_powerlaw_dataset

    ds = synthetic_powerlaw_dataset(
        num_graphs=max(2, n_total // 500), mean_nodes=500, seed=seed
    )
    n = min(n_total, ds.num_nodes)
    deg = ds.degrees[:n]
    off = ds.nbr_offsets[:n]
    r = rng.integers(0, np.maximum(deg, 1)[:, None],
                     size=(n, K)).astype(np.int64)
    nbr = ds.nbr_ids[(off[:, None] + r)]
    nbr = np.where(deg[:, None] > 0, nbr, np.arange(n)[:, None])
    nbr = np.minimum(nbr, n - 1)
    neigh = np.concatenate(
        [np.arange(n, dtype=np.int64)[:, None], nbr], axis=1
    ).astype(np.int32)
    return neigh


def build_problem(n_total, K, D, ff, n_shards, seed=0, graph="random"):
    import jax
    import optax

    from graph_transformer_tpu.parallel.edge_partition import (
        build_halo_plan,
        halo_cost_model,
        init_halo_unsup_params,
        make_halo_train_step,
    )
    from graph_transformer_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(seed)
    neigh = make_neigh(n_total, K, graph, seed)
    n_total = neigh.shape[0] - (neigh.shape[0] % n_shards) or neigh.shape[0]
    neigh = np.minimum(neigh[:n_total], n_total - 1)
    plan = build_halo_plan(neigh, n_shards)
    x = rng.standard_normal((n_total, D)).astype(np.float32)
    devices = jax.devices()[:n_shards]
    mesh = make_mesh(model_parallel=1, devices=devices)
    params = init_halo_unsup_params(
        jax.random.key(1), 2, D, ff, n_total, num_timesteps=1
    )
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_halo_train_step(opt, mesh, n_total, nsampled=64,
                                num_timesteps=1)
    model = halo_cost_model(plan, n_total // n_shards, D, 2, ff)
    return step, params, opt_state, x, plan, model


def timed_steps(step, params, opt_state, x, plan, steps=STEPS):
    import jax
    import jax.numpy as jnp

    key = jax.random.key(3)
    # warm (compile)
    p, s, loss = step(params, opt_state, x, plan, key)
    float(loss)
    t0 = time.perf_counter()
    for i in range(steps):
        p, s, loss = step(p, s, x, plan, jax.random.fold_in(key, i))
    float(loss)  # value fetch = completion barrier
    return (time.perf_counter() - t0) / steps


def compare_partitions(n_total, K, D, ff, out_path):
    """Round-4 anchor (VERDICT item 1c): on the power-law graph, compare
    the naive equal-node contiguous partition against
    ``partition_nodes_by_edges``, and the blocking exchange against the
    overlapped schedule, at S in {2, 4, 8}.  Also reports the adversarial
    uniform-random partition — on it the interior fraction is ~(1/S)^K, so
    NO schedule can hide the exchange (every row's compute depends on it);
    the partitioner exists precisely so deployments never run that case."""
    from graph_transformer_tpu.parallel.edge_partition import (
        apply_node_partition,
        build_halo_plan,
        halo_cost_model,
        partition_nodes_by_edges,
    )

    rng = np.random.default_rng(0)
    rows = []
    for graph in ("powerlaw", "random"):
        neigh = make_neigh(n_total, K, graph)
        n = neigh.shape[0]
        deg = np.bincount(neigh[:, 1:].reshape(-1), minlength=n)
        x = rng.standard_normal((n, D)).astype(np.float32)
        for S in (2, 4, 8):
            n_even = n - (n % S)
            plan_naive = build_halo_plan(
                np.minimum(neigh[:n_even], n_even - 1), S
            )
            m_naive = halo_cost_model(plan_naive, n_even // S, D, 2, ff)
            part = partition_nodes_by_edges(deg, S, crossing_window=0.0)
            neigh_b, _ = apply_node_partition(part, neigh, x)
            plan_bal = build_halo_plan(neigh_b, S)
            m_bal = halo_cost_model(plan_bal, part.n_local, D, 2, ff,
                                    valid_fraction=float(part.valid.mean()))
            part_mc = partition_nodes_by_edges(deg, S, neigh=neigh,
                                               crossing_window=0.15)
            neigh_mc, _ = apply_node_partition(part_mc, neigh, x)
            plan_mc = build_halo_plan(neigh_mc, S)
            m_mc = halo_cost_model(
                plan_mc, part_mc.n_local, D, 2, ff,
                valid_fraction=float(part_mc.valid.mean()))

            def summarize(m):
                return {
                    "halo_rows": m["halo_rows_per_shard"],
                    "collective_bytes": m["collective_bytes_per_step"],
                    "interior_fraction": m["interior_fraction"],
                    "valid_fraction": m["valid_fraction"],
                    "eff_blocking": m["predicted_efficiency"],
                    "eff_overlap": m["predicted_efficiency_overlap"],
                }

            row = {
                "graph": graph,
                "shards": S,
                "naive": summarize(m_naive),
                "edge_balanced": summarize(m_bal),
                "edge_balanced_min_crossing": summarize(m_mc),
            }
            rows.append(row)
            print(json.dumps(row))
    prev = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            prev = json.load(f)
    prev["partition_comparison_r4"] = rows
    with open(out_path, "w") as f:
        json.dump(prev, f, indent=2)
    print(f"wrote {out_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["chip", "virtual", "model"],
                    required=True)
    ap.add_argument("--n_total", type=int, default=8192)
    ap.add_argument("--K", type=int, default=8)
    ap.add_argument("--D", type=int, default=64)
    ap.add_argument("--ff", type=int, default=256)
    ap.add_argument("--graph", choices=["random", "powerlaw"],
                    default="random")
    ap.add_argument("--out", default="runs/halo_anchor.json")
    args = ap.parse_args()

    if args.mode == "model":
        compare_partitions(args.n_total, args.K, args.D, args.ff, args.out)
        return

    prev = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)

    results = prev
    results.setdefault("problem", dict(n_total=args.n_total, K=args.K,
                                       D=args.D, ff=args.ff))
    if args.mode == "chip":
        step, p, s, x, plan, model = build_problem(
            args.n_total, args.K, args.D, args.ff, 1, graph=args.graph
        )
        t = timed_steps(step, p, s, x, plan)
        results["chip_s1"] = {
            "ms_per_step": t * 1e3,
            "model_t_compute_ms": model["t_compute_s"] * 1e3,
            "model_flops_per_step": model["local_flops_per_step"],
            # achieved fraction of the model's peak-FLOPs assumption —
            # calibrates the model's compute term for the pod prediction
            "achieved_peak_fraction": model["t_compute_s"] / t,
        }
        print(json.dumps(results["chip_s1"], indent=2))
    else:
        rows = []
        for S in (1, 2, 4, 8):
            step, p, s, x, plan, model = build_problem(
                args.n_total, args.K, args.D, args.ff, S, graph=args.graph
            )
            t = timed_steps(step, p, s, x, plan, steps=10)
            rows.append({
                "shards": S,
                "ms_per_step_cpu": t * 1e3,
                "halo_rows_per_shard": model["halo_rows_per_shard"],
                "collective_bytes_per_step":
                    model["collective_bytes_per_step"],
                "predicted_efficiency_v5e":
                    model["predicted_efficiency"],
            })
            print(json.dumps(rows[-1]))
        results["virtual_mesh" if args.graph == "random"
                else "virtual_mesh_powerlaw"] = rows
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
