"""A/B: recompute (hybrid) backward vs the stored-residual backward
(ops/pallas_stored_bwd) at bench shapes — the BASELINE round-4 "named
next optimization", measured.

100-step grad-loop scan, value-fetch barrier, rate 0.5, bf16.
Run on the real chip: python scripts/bench_stored_bwd.py
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

    from graph_transformer_tpu.ops.pallas_stored_bwd import (
        fused_u2gnn_encoder_stored,
    )
    from graph_transformer_tpu.ops.pallas_u2gnn import fused_u2gnn_encoder

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N * S, D)), jnp.bfloat16)
    params = tuple(
        jnp.asarray(rng.standard_normal(s) * 0.2, jnp.float32)
        for s in [(T, D, 3 * D), (T, 3 * D), (T, D, D), (T, D), (T, D),
                  (T, D), (T, D, F), (T, F), (T, F, D), (T, D), (T, D),
                  (T, D)]
    )
    w = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)

    def seed_of(key):
        return jax.random.randint(key, (1,), 0, 2**31 - 1, jnp.int32)

    def loss_of(fn, tile_target=512):
        def loss(p, key):
            return jnp.sum(
                fn(x, p, seed_of(key), S, T, RATE, tile_target) * w)
        return loss

    def scan_of(loss):
        @jax.jit
        def run(p, key):
            def body(c, i):
                g = jax.grad(loss)(p, jax.random.fold_in(key, i))
                acc = c + sum(jnp.sum(jnp.abs(t))
                              for t in jax.tree_util.tree_leaves(g))
                return acc, 0.0

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(STEPS))
            return acc

        return run

    # same-seed grad cross-check at rate 0.5 (small shapes): the two paths
    # replay identical dropout masks; differences are rematerialization-
    # precision only
    n_s = 64
    xs = jnp.asarray(rng.standard_normal((n_s * S, D)), jnp.bfloat16)
    ws = jnp.asarray(rng.standard_normal((n_s, D)), jnp.float32)
    seed = jnp.asarray([77], jnp.int32)
    # forward with dropout must be EXACT (same PRNG streams)
    fh = fused_u2gnn_encoder(xs, params, seed, S, T, RATE)
    fs = fused_u2gnn_encoder_stored(xs, params, seed, S, T, RATE)
    fwd_d = float(jnp.abs(fh - fs).max())
    print(f"same-seed dropout FWD max delta = {fwd_d:.2e}", flush=True)
    assert fwd_d == 0.0, "stored fwd diverges from hybrid fwd"
    # grads differ by rematerialization precision only (the hybrid
    # recomputes residuals from bf16-rounded saved inputs; the stored path
    # keeps the true forward values) — check they are the same gradient up
    # to that noise: near-unit cosine + bounded per-leaf relative delta
    gh = jax.grad(lambda p: jnp.sum(
        fused_u2gnn_encoder(xs, p, seed, S, T, RATE) * ws))(params)
    gs = jax.grad(lambda p: jnp.sum(
        fused_u2gnn_encoder_stored(xs, p, seed, S, T, RATE) * ws))(params)
    va = jnp.concatenate([a.reshape(-1) for a in gh])
    vb = jnp.concatenate([b.reshape(-1) for b in gs])
    cos = float(jnp.vdot(va, vb)
                / (jnp.linalg.norm(va) * jnp.linalg.norm(vb)))
    rel = max(
        float(jnp.abs(a - b).max()) / max(float(jnp.abs(a).max()), 1e-9)
        for a, b in zip(gh, gs)
    )
    print(f"same-seed dropout grad: cosine = {cos:.6f}, "
          f"max per-leaf rel = {rel:.2e}", flush=True)
    # The rate-0.5 per-leaf rel runs ~0.25: that is the HYBRID's
    # rematerialization noise (it recomputes residuals from bf16-rounded
    # saved inputs), not a stored-path defect.  Anchor the correctness
    # gate against the f32 reference at rate=0 instead: the stored path
    # must be at least as close to the true gradient as the hybrid.
    assert cos > 0.999, "stored-bwd grads diverge (cosine)"
    from graph_transformer_tpu.ops.pallas_u2gnn import (
        fused_u2gnn_encoder_reference,
    )
    x3 = xs.reshape(n_s, S, -1)
    gr = jax.grad(lambda p: jnp.sum(
        fused_u2gnn_encoder_reference(x3, p, T) * ws))(params)
    gh0 = jax.grad(lambda p: jnp.sum(
        fused_u2gnn_encoder(xs, p, seed, S, T, 0.0) * ws))(params)
    gs0 = jax.grad(lambda p: jnp.sum(
        fused_u2gnn_encoder_stored(xs, p, seed, S, T, 0.0) * ws))(params)
    worst_h = worst_s = 0.0
    for r, a, b in zip(gr, gh0, gs0):
        m = max(float(jnp.abs(r).max()), 1e-9)
        worst_h = max(worst_h, float(jnp.abs(a - r).max()) / m)
        worst_s = max(worst_s, float(jnp.abs(b - r).max()) / m)
    print(f"rate=0 vs f32 reference: hybrid rel {worst_h:.4f}, "
          f"stored rel {worst_s:.4f}", flush=True)
    assert worst_s <= worst_h * 1.5 and worst_s < 0.1, (
        "stored-bwd further from the f32 reference than hybrid")

    # tile_target: hybrid's best is 512; stored OOMs scoped VMEM at 512
    # (18.1M > 16M limit) so it runs at 384 — measured faster than 512
    # under a raised limit anyway (7.52 vs 7.67 ms/step).
    results = {}
    for name, fn, tt in (("hybrid", fused_u2gnn_encoder, 512),
                         ("stored", fused_u2gnn_encoder_stored, 384)):
        run = scan_of(loss_of(fn, tt))
        key = jax.random.key(7)
        float(run(params, key))  # compile + warm
        t0 = time.perf_counter()
        float(run(params, key))
        dt = (time.perf_counter() - t0) / STEPS * 1e3
        results[name] = dt
        print(f"{name}: {dt:.3f} ms/step", flush=True)
    results["delta_ms"] = results["hybrid"] - results["stored"]
    results["same_seed_grad_rel"] = rel
    os.makedirs("runs", exist_ok=True)
    prev = {}
    if os.path.exists("runs/stored_bwd_ab.json"):
        with open("runs/stored_bwd_ab.json") as f:
            prev = json.load(f)
    prev["ab_r5"] = results
    with open("runs/stored_bwd_ab.json", "w") as f:
        json.dump(prev, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
