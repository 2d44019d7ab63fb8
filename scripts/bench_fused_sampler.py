"""A/B: two-pass (sampler kernel + XLA feature gather + encoder) vs the
fully-fused sample+gather+encode kernel (VERDICT r3 item 6; the round-2
named optimization, BASELINE.md:88-95).

Bench shapes: N=8832 nodes, S=9, D=4, F=1024, T=4, rate 0.5, bf16, 100-step
lax.scan, value-fetch completion barrier.  Both paths compute
grad(sum(out*w)) wrt params — everything downstream (pool/head/loss/Adam)
is identical in the real step and excluded here.

Run on the real chip: python scripts/bench_fused_sampler.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N, S, D, F, T, RATE, STEPS = 8832, 9, 4, 1024, 4, 0.5, 100


def main():
    import jax
    import jax.numpy as jnp

    from graph_transformer_tpu.data.tu import synthetic_powerlaw_dataset
    from graph_transformer_tpu.ops.pallas_sampled_encoder import (
        build_tag_table,
        dataset_codebook,
        fused_u2gnn_encoder_sampled,
    )
    from graph_transformer_tpu.ops.pallas_u2gnn import fused_u2gnn_encoder
    from graph_transformer_tpu.sampling.pallas_sampler import (
        build_neighbor_table,
        resample_batch_neighbors_fast,
    )

    ds = synthetic_powerlaw_dataset(
        "REDDITMULTI5K-like", num_graphs=64, mean_nodes=509, seed=0
    )
    cb = dataset_codebook(ds.node_feat)
    assert cb is not None, "bench dataset features must be codebook-able"
    tags, codebook_np = cb
    codebook = jnp.asarray(codebook_np)
    table = build_neighbor_table(ds)
    assert table is not None

    rng = np.random.default_rng(0)
    gidx = rng.permutation(ds.num_nodes)[:N].astype(np.int32)
    rows = jnp.asarray(table[gidx])
    tag_rows = jnp.asarray(build_tag_table(table, tags)[gidx])
    degb = jnp.asarray(ds.degrees[gidx][:, None].astype(np.int32))
    self_tag = jnp.asarray(tags[gidx][:, None])
    gidx_dev = jnp.asarray(gidx)
    x_global = jnp.asarray(ds.node_feat, jnp.bfloat16)

    params = tuple(
        jnp.asarray(rng.standard_normal(s) * 0.2, jnp.float32)
        for s in [(T, D, 3 * D), (T, 3 * D), (T, D, D), (T, D), (T, D),
                  (T, D), (T, D, F), (T, F), (T, F, D), (T, D), (T, D),
                  (T, D)]
    )
    w = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)

    # ---- deterministic parity gate (degree-1 tables => sampling is
    # deterministic) before any timing
    det_n, det_S, det_T, det_F = 64, 5, 2, 32
    det_tags = rng.integers(0, D, det_n).astype(np.int32)
    det_nbr = rng.integers(0, det_n, det_n).astype(np.int32)
    det_params = tuple(
        jnp.asarray(rng.standard_normal(s) * 0.3, jnp.float32)
        for s in [(det_T, D, 3 * D), (det_T, 3 * D), (det_T, D, D),
                  (det_T, D), (det_T, D), (det_T, D), (det_T, D, det_F),
                  (det_T, det_F), (det_T, det_F, D), (det_T, D),
                  (det_T, D), (det_T, D)]
    )
    got = fused_u2gnn_encoder_sampled(
        jnp.asarray(np.tile(det_tags[det_nbr][:, None], (1, 128))),
        jnp.ones((det_n, 1), jnp.int32),
        jnp.asarray(det_tags[:, None]),
        jnp.eye(D, dtype=jnp.float32),
        det_params, jnp.asarray([11], jnp.int32), det_S, det_T, 0.0,
    )
    det_neigh_tags = np.concatenate(
        [det_tags[:, None],
         np.tile(det_tags[det_nbr][:, None], (1, det_S - 1))], axis=1)
    det_x = np.eye(D, dtype=np.float32)[det_neigh_tags.reshape(-1)]
    want = fused_u2gnn_encoder(
        jnp.asarray(det_x, jnp.bfloat16), det_params, None, det_S, det_T, 0.0
    )
    gap = float(jnp.abs(got - want).max())
    print(f"deterministic parity gate: max|delta| = {gap:.2e}", flush=True)
    assert gap < 5e-2, "fused sampled encoder parity FAILED"

    def seed_of(key):
        return jax.random.randint(key, (1,), 0, 2**31 - 1, jnp.int32)

    def loss_a(p, key):
        k_samp, k_drop = jax.random.split(key)
        ng = resample_batch_neighbors_fast(
            seed_of(k_samp), rows, degb, gidx_dev, S - 1
        )
        nf = x_global[ng]  # [N, S, D]
        out = fused_u2gnn_encoder(
            nf.reshape(N * S, D), p, seed_of(k_drop), S, T, RATE
        )
        return jnp.sum(out * w)

    def loss_b(p, key):
        out = fused_u2gnn_encoder_sampled(
            tag_rows, degb, self_tag, codebook, p, seed_of(key), S, T, RATE
        )
        return jnp.sum(out * w)

    def scan_of(loss):
        @jax.jit
        def run(p, key):
            def body(c, i):
                g = jax.grad(loss)(p, jax.random.fold_in(key, i))
                acc = c + sum(
                    jnp.sum(jnp.abs(x))
                    for x in jax.tree_util.tree_leaves(g)
                )
                return acc, 0.0
            acc, _ = jax.lax.scan(
                body, jnp.zeros(()), jnp.arange(STEPS)
            )
            return acc

        return run

    results = {}
    for name, loss in (("two_pass", loss_a), ("fused_sampled", loss_b)):
        run = scan_of(loss)
        key = jax.random.key(7)
        float(run(params, key))  # compile + warm
        t0 = time.perf_counter()
        float(run(params, key))
        dt = (time.perf_counter() - t0) / STEPS * 1e3
        results[name] = dt
        print(f"{name}: {dt:.3f} ms/step", flush=True)

    # sanity: fwd output distribution comparable (not identical: different
    # PRNG streams)
    oa = fused_u2gnn_encoder(
        x_global[resample_batch_neighbors_fast(
            jnp.asarray([3], jnp.int32), rows, degb, gidx_dev, S - 1
        )].reshape(N * S, D), params, None, S, T, 0.0)
    ob = fused_u2gnn_encoder_sampled(
        tag_rows, degb, self_tag, codebook, params,
        jnp.asarray([3], jnp.int32), S, T, 0.0)
    results["fwd_mean_abs_a"] = float(jnp.mean(jnp.abs(oa)))
    results["fwd_mean_abs_b"] = float(jnp.mean(jnp.abs(ob)))
    results["delta_ms"] = results["two_pass"] - results["fused_sampled"]
    os.makedirs("runs", exist_ok=True)
    prev = {}
    if os.path.exists("runs/fused_sampler_ab.json"):
        with open("runs/fused_sampler_ab.json") as f:
            prev = json.load(f)
    prev["ab_r4"] = results
    with open("runs/fused_sampler_ab.json", "w") as f:
        json.dump(prev, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
