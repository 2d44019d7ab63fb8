"""Train-step component profile on the real TPU.

Times variants of the supervised train step on the bench workload
(REDDITMULTI5K-like, batch 16, K=8, T=4, ff 1024) to locate the next
bottleneck.  Each variant runs as one 100-step ``lax.scan`` device program;
completion is barriered by fetching the summed loss to host (the only
reliable barrier through this environment's remote-TPU relay — see
BASELINE.md).

Run (TPU): timeout 590 python scripts/profile_step.py
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
    from graph_transformer_tpu.train.sup_trainer import SupTrainer

    ds = synthetic_powerlaw_dataset(
        "REDDITMULTI5K-like", num_graphs=64, mean_nodes=509, seed=0
    )

    def make(use_pallas, dropout=0.5, dtype="bfloat16", on_dev=True, T_=T):
        cfg = ExperimentConfig(
            data=DataConfig(batch_size=BATCH, num_neighbors=K),
            model=ModelConfig(
                num_timesteps=T_, num_hidden_layers=1, ff_hidden_size=FF,
                compute_dtype=dtype, use_pallas=use_pallas, dropout=dropout,
            ),
            train=TrainConfig(num_epochs=1, on_device_sampling=on_dev),
        )
        return SupTrainer(
            ds, cfg, train_idx=np.arange(ds.num_graphs), test_idx=np.arange(8)
        )

    def run(tag, trainer, steps=STEPS, **scan_kw):
        batch = jax.device_put(trainer.builder.sample())
        edges = float(np.asarray(batch.edge_mask).sum())
        p, s = trainer.params, trainer.opt_state
        p, s, warm = trainer._train_scan(p, s, batch, jr.key(1), steps,
                                         trainer.csr)
        float(jnp.sum(warm))
        t0 = time.perf_counter()
        p, s, losses = trainer._train_scan(p, s, batch, jr.key(2), steps,
                                           trainer.csr)
        float(jnp.sum(losses))
        dt = time.perf_counter() - t0
        ms = dt / steps * 1e3
        print(f"{tag:46s} {ms:8.2f} ms/step   {edges * steps / dt / 1e6:8.2f} M edges/s")
        return ms

    # NB: each variant recompiles; order cheap-insight-first.
    run("full step, pallas ffn, bf16, dropout 0.5", make(True))
    run("full step, XLA ffn, bf16, dropout 0.5", make(False))
    run("pallas, NO dropout (PRNG cost)", make(True, dropout=0.0))
    run("pallas, f32 (MXU bf16 speedup)", make(True, dtype="float32"))
    run("pallas, host sampling (resample cost)", make(True, on_dev=False))
    run("pallas, T=1 (per-timestep cost)", make(True, T_=1))

    # forward-only: no grad/optimizer
    tr = make(True)
    model, csr, cfgK = tr.model, tr.csr, K
    total_nodes = ds.num_nodes
    from graph_transformer_tpu.sampling.neighbors import resample_batch_neighbors

    @partial(jax.jit, static_argnums=(2,))
    def fwd_scan(params, batch, steps, key):
        def body(carry, i):
            k = jr.fold_in(key, i)
            k_s, k_d = jr.split(k)
            neigh = resample_batch_neighbors(
                k_s, csr, batch.node_gidx, batch.node_mask, cfgK, total_nodes
            )
            b = dataclasses.replace(batch, neigh=neigh)
            scores = model.apply(params, b, rng=k_d)
            return carry, jnp.sum(scores)

        _, out = jax.lax.scan(body, 0, jnp.arange(steps))
        return out

    batch = jax.device_put(tr.builder.sample())
    edges = float(np.asarray(batch.edge_mask).sum())
    float(jnp.sum(fwd_scan(tr.params, batch, STEPS, jr.key(1))))
    t0 = time.perf_counter()
    float(jnp.sum(fwd_scan(tr.params, batch, STEPS, jr.key(2))))
    dt = time.perf_counter() - t0
    print(f"{'forward only (pallas, dropout 0.5)':46s} {dt / STEPS * 1e3:8.2f} ms/step   "
          f"{edges * STEPS / dt / 1e6:8.2f} M edges/s")


if __name__ == "__main__":
    main()
