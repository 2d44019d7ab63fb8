"""A/B: dense vs banded attention layout in the fused encoder kernel.

Times T=4 encoder layers fwd and fwd+bwd at bench shapes (79,488 rows,
S=9, D=4, F=1024, bf16, rate 0.5) with pallas_encoder.BANDED toggled in
the same process.  Run: timeout 590 python scripts/bench_banded.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import jax.random as jr

from graph_transformer_tpu.ops import pallas_encoder
from graph_transformer_tpu.ops.attention import (
    init_encoder_params,
    transformer_encoder,
)

B, S, D, F, T, STEPS = 8832, 9, 4, 1024, 4, 100


def main():
    enc = init_encoder_params(jr.key(0), T, D, F)
    x = jr.normal(jr.key(1), (B, S, D), jnp.bfloat16)

    def make_fwd():
        @jax.jit
        def f():
            def body(c, i):
                k = jr.fold_in(jr.key(6), i)
                out = transformer_encoder(
                    enc, x, num_heads=1, dropout_rate=0.5, rng=k,
                    num_timesteps=T, use_pallas=True,
                )
                return c + jnp.sum(out.astype(jnp.float32)), 0
            c, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
            return c
        return f

    def make_grad():
        @jax.jit
        def f():
            def body(c, i):
                k = jr.fold_in(jr.key(8), i)

                def loss(e):
                    out = transformer_encoder(
                        e, x, num_heads=1, dropout_rate=0.5, rng=k,
                        num_timesteps=T, use_pallas=True,
                    )
                    return jnp.sum(out.astype(jnp.float32))

                g = jax.grad(loss)(enc)
                return c + jnp.sum(g.w_in.astype(jnp.float32)), 0
            c, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
            return c
        return f

    def timed(tag, fn):
        float(fn())
        t0 = time.perf_counter()
        float(fn())
        dt = (time.perf_counter() - t0) / STEPS * 1e3
        print(f"{tag:40s} {dt:8.3f} ms/step")
        return dt

    for banded in (False, True):
        pallas_encoder.BANDED = banded
        tag = "banded" if banded else "dense "
        timed(f"{tag} T=4 fwd", make_fwd())
        timed(f"{tag} T=4 fwd+bwd", make_grad())


if __name__ == "__main__":
    main()
