"""Focused component timings for the round-3 fused-kernel work.

Times, on the real chip at bench shapes (batch 16, K=8, T=4, ff 1024, bf16,
fused Pallas encoder):

  a. full train step        (bench workload)
  b. forward only           (sample + gather + T encoder layers + pool + heads)
  c. sampling only          (resample_batch_neighbors)
  d. sampling + gather      (c + x[neigh])
  e. T fused encoder layers (no sampling/gather/pool; input pre-gathered)
  f. one fused encoder layer

Each is a 100-iter lax.scan, one dispatch, value-fetch completion barrier.
Run: timeout 590 python scripts/profile_focus.py
"""

import dataclasses
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH, K, T, FF = 16, 8, 4, 1024
STEPS = 100


def main():
    import jax
    import jax.numpy as jnp
    import jax.random as jr

    from graph_transformer_tpu.config import (
        DataConfig, ExperimentConfig, ModelConfig, TrainConfig,
    )
    from graph_transformer_tpu.data.tu import synthetic_powerlaw_dataset
    from graph_transformer_tpu.sampling.neighbors import resample_batch_neighbors
    from graph_transformer_tpu.train.sup_trainer import SupTrainer

    ds = synthetic_powerlaw_dataset(
        "REDDITMULTI5K-like", num_graphs=64, mean_nodes=509, seed=0
    )
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=BATCH, num_neighbors=K),
        model=ModelConfig(
            num_timesteps=T, num_hidden_layers=1, ff_hidden_size=FF,
            compute_dtype="bfloat16", use_pallas=True,
        ),
        train=TrainConfig(num_epochs=1),
    )
    trainer = SupTrainer(
        ds, cfg, train_idx=np.arange(ds.num_graphs), test_idx=np.arange(8)
    )
    batch = jax.device_put(trainer.builder.sample())
    csr = trainer.csr
    model = trainer.model
    params = trainer.params
    total_nodes = ds.num_nodes
    n_pad = batch.node_gidx.shape[0]
    print(f"n_pad={n_pad} total_nodes={total_nodes} rows/layer={n_pad*(K+1)}")

    def timed(tag, fn, *args):
        out = fn(*args)
        float(jnp.sum(out))  # warm (compile)
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out))
        dt = time.perf_counter() - t0
        print(f"{tag:44s} {dt / STEPS * 1e3:8.3f} ms/step")
        return dt / STEPS * 1e3

    # a. full step
    def full(params, opt_state):
        p, s, losses = trainer._train_scan(
            params, opt_state, batch, jr.key(2), STEPS, csr
        )
        return losses

    timed("a. full train step", jax.jit(lambda: full(params, trainer.opt_state)))

    # b. forward only (with fresh sampling per iter)
    @jax.jit
    def fwd_scan():
        def body(c, i):
            k = jr.fold_in(jr.key(3), i)
            ks, kd = jr.split(k)
            neigh = resample_batch_neighbors(
                ks, csr, batch.node_gidx, batch.node_mask, K, total_nodes
            )
            b = dataclasses.replace(batch, neigh=neigh)
            scores = model.apply(params, b, rng=kd)
            return c + jnp.sum(scores.astype(jnp.float32)), 0
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
        return c

    timed("b. forward only (sample+gather+enc+pool)", fwd_scan)

    # c. sampling only
    @jax.jit
    def samp_scan():
        def body(c, i):
            k = jr.fold_in(jr.key(4), i)
            neigh = resample_batch_neighbors(
                k, csr, batch.node_gidx, batch.node_mask, K, total_nodes
            )
            return c + jnp.sum(neigh), 0
        c, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(STEPS))
        return c

    timed("c. sampling only", samp_scan)

    # d. sampling + feature gather
    x = batch.x.astype(jnp.bfloat16)

    @jax.jit
    def sampgather_scan():
        def body(c, i):
            k = jr.fold_in(jr.key(5), i)
            neigh = resample_batch_neighbors(
                k, csr, batch.node_gidx, batch.node_mask, K, total_nodes
            )
            nf = x[neigh]
            return c + jnp.sum(nf.astype(jnp.float32)), 0
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
        return c

    timed("d. sampling + feature gather", sampgather_scan)

    # e. T fused encoder layers on a fixed pre-gathered input
    from graph_transformer_tpu.ops.attention import transformer_encoder

    neigh0 = np.asarray(batch.neigh)
    nf0 = jnp.asarray(np.asarray(batch.x)[neigh0], dtype=jnp.bfloat16)
    enc = params.encoders[0]

    @jax.jit
    def enc_scan():
        def body(c, i):
            k = jr.fold_in(jr.key(6), i)
            out = transformer_encoder(
                enc, nf0, num_heads=1, dropout_rate=0.5, rng=k,
                num_timesteps=T, use_pallas=True,
            )
            return c + jnp.sum(out.astype(jnp.float32)), 0
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
        return c

    timed("e. T=4 fused encoder layers (fwd only)", enc_scan)

    @jax.jit
    def enc1_scan():
        def body(c, i):
            k = jr.fold_in(jr.key(7), i)
            out = transformer_encoder(
                enc, nf0, num_heads=1, dropout_rate=0.5, rng=k,
                num_timesteps=1, use_pallas=True,
            )
            return c + jnp.sum(out.astype(jnp.float32)), 0
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
        return c

    timed("f. one fused encoder layer (fwd only)", enc1_scan)

    # g. encoder fwd+bwd (grad wrt params) to isolate bwd cost
    @jax.jit
    def enc_grad_scan():
        def body(c, i):
            k = jr.fold_in(jr.key(8), i)

            def loss(e):
                out = transformer_encoder(
                    e, nf0, num_heads=1, dropout_rate=0.5, rng=k,
                    num_timesteps=T, use_pallas=True,
                )
                return jnp.sum(out.astype(jnp.float32))

            g = jax.grad(loss)(enc)
            return c + jnp.sum(g.w_in.astype(jnp.float32)), 0
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
        return c

    timed("g. T=4 encoder fwd+bwd", enc_grad_scan)


if __name__ == "__main__":
    main()
