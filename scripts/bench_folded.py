"""A/B: stored-residual row-space backward vs the folded-lane encoder
(ops/pallas_folded) at bench shapes — VERDICT r4 item 7 ("measure the
folded-lane [G, S·D] layout — or formally retire it"), measured.

100-step grad-loop scan, value-fetch barrier, rate 0.5, bf16.
Run on the real chip: python scripts/bench_folded.py
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

    from graph_transformer_tpu.ops.pallas_folded import (
        folded_u2gnn_encoder_grad,
    )
    from graph_transformer_tpu.ops.pallas_stored_bwd import (
        fused_u2gnn_encoder_stored,
    )
    from graph_transformer_tpu.ops.pallas_u2gnn import (
        fused_u2gnn_encoder_reference,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N * S, D)), jnp.bfloat16)
    params = tuple(
        jnp.asarray(rng.standard_normal(s) * 0.2, jnp.float32)
        for s in [(T, D, 3 * D), (T, 3 * D), (T, D, D), (T, D), (T, D),
                  (T, D), (T, D, F), (T, F), (T, F, D), (T, D), (T, D),
                  (T, D)]
    )
    w = jnp.asarray(rng.standard_normal((N, D)), jnp.float32)

    # correctness gate at rate=0 vs the f32 reference (small shapes):
    # near-unit cosine; outliers are relu-boundary bf16 flips
    n_s = 64
    xs = jnp.asarray(rng.standard_normal((n_s * S, D)), jnp.bfloat16)
    ws = jnp.asarray(rng.standard_normal((n_s, D)), jnp.float32)
    gr = jax.grad(lambda p: jnp.sum(
        fused_u2gnn_encoder_reference(xs.reshape(n_s, S, D), p, T) * ws)
    )(params)
    gf = jax.grad(lambda p: jnp.sum(
        folded_u2gnn_encoder_grad(xs, p, None, S, T, 0.0) * ws))(params)
    va = jnp.concatenate([a.reshape(-1) for a in gr])
    vb = jnp.concatenate([b.reshape(-1) for b in gf])
    cos = float(jnp.vdot(va, vb)
                / (jnp.linalg.norm(va) * jnp.linalg.norm(vb)))
    print(f"rate=0 grad cosine vs f32 reference: {cos:.6f}", flush=True)
    assert cos > 0.999, "folded grads diverge from the reference"

    def seed_of(key):
        return jax.random.randint(key, (1,), 0, 2**31 - 1, jnp.int32)

    def scan_of(fn, tt):
        def loss(p, key):
            return jnp.sum(fn(x, p, seed_of(key), S, T, RATE, tt) * w)

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

    results = {"grad_cosine_vs_ref": cos}
    for name, fn, tt in (
        ("stored_rowspace", fused_u2gnn_encoder_stored, 384),
        ("folded_128", folded_u2gnn_encoder_grad, 128),
        ("folded_256", folded_u2gnn_encoder_grad, 256),
    ):
        run = scan_of(fn, tt)
        key = jax.random.key(7)
        float(run(params, key))
        t0 = time.perf_counter()
        float(run(params, key))
        dt = (time.perf_counter() - t0) / STEPS * 1e3
        results[name] = dt
        print(f"{name}: {dt:.3f} ms/step", flush=True)
    os.makedirs("runs", exist_ok=True)
    with open("runs/folded_ab.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
