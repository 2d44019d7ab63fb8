"""Validate + time the hybrid mega-fwd / per-layer-bwd encoder (ROADMAP 6).

1) Correctness with dropout ON (TPU PRNG only — no interpret impl): the
   hybrid bwd must produce grads identical to the mega bwd (_bwd_kernel),
   which replays masks with the very `_seed_layer` stream the forward uses
   — agreement proves the hybrid replays the forward's masks.  (A central
   finite-difference check was tried first and is noise-dominated at these
   shapes: it fails equally at rate=0 where interpret-mode parity vs the
   pure-jnp reference is already proven.)
2) A/B at bench shapes (79,488 rows, S=9, D=4, F=1024, bf16, rate 0.5):
   per-layer fused path vs whole-encoder hybrid, T=4 fwd and fwd+bwd.

Run: timeout 590 python scripts/bench_hybrid.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np

from graph_transformer_tpu.ops.attention import (
    init_encoder_params,
    neighborhood_encoder,
)
from graph_transformer_tpu.ops.pallas_u2gnn import fused_u2gnn_encoder

B, S, D, F, T, STEPS = 8832, 9, 4, 1024, 4, 100


def check_grad_with_dropout():
    """Hybrid bwd vs mega bwd at rate 0.5 with the same seed, small shapes:
    grads must agree (both recompute from the same per-(tile, layer) PRNG
    streams; the mega bwd literally calls the forward's _seed_layer)."""
    n, f = 36, 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n * S, D)), jnp.float32)
    params = tuple(
        jnp.asarray(rng.standard_normal(s) * 0.2, jnp.float32)
        for s in [(T, D, 3 * D), (T, 3 * D), (T, D, D), (T, D), (T, D),
                  (T, D), (T, D, f), (T, f), (T, f, D), (T, D), (T, D),
                  (T, D)]
    )
    seed = jnp.asarray([1234], jnp.int32)
    w = jnp.asarray(rng.standard_normal((n, D)), jnp.float32)

    def grads(mega_bwd):
        def loss(p, xx):
            return jnp.sum(
                fused_u2gnn_encoder(xx, p, seed, S, T, 0.5, 512, False,
                                    mega_bwd) * w)

        return jax.jit(jax.grad(loss, argnums=(0, 1)))(params, x)

    gp_h, gx_h = grads(mega_bwd=False)
    gp_m, gx_m = grads(mega_bwd=True)
    ok = True
    for i, (a, b) in enumerate(zip(gp_h, gp_m)):
        d = float(jnp.abs(a - b).max())
        ok = ok and d < 1e-4
        if d >= 1e-4:
            print(f"  param {i}: max|Δ| = {d:.2e}")
    dx = float(jnp.abs(gx_h - gx_m).max())
    ok = ok and dx < 1e-4
    print(f"  dx max|Δ| = {dx:.2e}")
    print("  dropout-grad check (hybrid == mega):", "PASS" if ok else "FAIL")
    return ok


def timed(f, label):
    f()  # compile + warmup
    t0 = time.perf_counter()
    float(f())
    dt = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"  {label}: {dt:.2f} ms/step")
    return dt


def main():
    print("== grad check with dropout (rate 0.5, fixed seed) ==")
    if not check_grad_with_dropout():
        sys.exit(1)

    enc = init_encoder_params(jr.key(0), T, D, F)
    x = jr.normal(jr.key(1), (B, S, D), jnp.bfloat16)

    def make(whole, grad):
        @jax.jit
        def f():
            def body(c, i):
                k = jr.fold_in(jr.key(6), i)

                def loss(e):
                    out = neighborhood_encoder(
                        e, x, dropout_rate=0.5, rng=k, num_timesteps=T,
                        use_pallas=True, whole_encoder=whole,
                    )
                    return jnp.sum(out.astype(jnp.float32))

                if grad:
                    g = jax.grad(loss)(enc)
                    return c + jnp.sum(g.w_in.astype(jnp.float32)), 0
                return c + loss(enc), 0

            c, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
            return c

        return f

    print(f"== A/B at bench shapes ({B * S} rows, T={T}, rate 0.5) ==")
    r = {}
    for whole in (False, True):
        tag = "hybrid" if whole else "per-layer"
        r[f"{tag}_fwd"] = timed(make(whole, False), f"{tag} fwd")
        r[f"{tag}_fwd+bwd"] = timed(make(whole, True), f"{tag} fwd+bwd")
    print(
        f"fwd+bwd: per-layer {r['per-layer_fwd+bwd']:.2f} -> "
        f"hybrid {r['hybrid_fwd+bwd']:.2f} ms "
        f"({(1 - r['hybrid_fwd+bwd'] / r['per-layer_fwd+bwd']) * 100:+.1f}%)"
    )


if __name__ == "__main__":
    main()
