"""Headline benchmark: supervised U2GNN training throughput, edges/s/chip.

The driver-defined north-star metric (BASELINE.json) is edges/s/chip on
REDDITMULTI5K-scale batches.  The REDDIT text files are stripped from the
reference checkout (``dataset/.MISSING_LARGE_BLOBS``), so the workload is a
synthetic power-law dataset with REDDITMULTI5K statistics (~509 nodes/graph,
constant 4-dim features — see ``data/tu.py:synthetic_powerlaw_dataset``).

Measured: full training steps — on-device neighborhood resampling + forward
+ backward + Adam — on the default JAX device (one TPU chip under the
driver).  ``vs_baseline`` is the ratio to the reference implementation's
throughput on the same workload, measured by
``scripts/bench_torch_reference.py`` (PyTorch CPU: the reference is
cuda-if-available-else-cpu, single-device only — it has no TPU or multi-chip
path at all).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# Reference throughput on this box (2-CPU, torch 2.x) via
# scripts/bench_torch_reference.py at the IDENTICAL workload this bench
# runs (batch 16, K=8, T=4, ff 1024, 1 hidden layer — intended TF
# neighborhood-attention semantics; the PyTorch reference's accidental
# node-axis attention is O(N²) in batch nodes and did not finish a single
# step at this scale).  Best of repeated measurements, favoring the
# reference: 1,697 edges/s at batch 16 (2026-08-19; second run 839); at
# the README's batch 4 the reference reaches 3,894 (2026-08-17; runs on
# 2026-08-19: 3,060 / 2,162).  See BASELINE.md.
REFERENCE_EDGES_PER_S = float(os.environ.get("GT_REF_EDGES_PER_S", "1697"))

BATCH, K, T, FF = 16, 8, 4, 1024
WARMUP, STEPS = 10, 100


def main():
    import jax

    from graph_transformer_tpu.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )
    from graph_transformer_tpu.data.tu import synthetic_powerlaw_dataset
    from graph_transformer_tpu.train.sup_trainer import SupTrainer

    # GT_BENCH_HEAVY=1: REDDIT-realistic degree distribution (root-hub
    # threads, lognormal graph sizes, max degree > 1000) — exercises the
    # hub-subsample sampler rows instead of the friendlier plain-BA tail
    # (VERDICT r4 weak #2).  The headline metric stays the plain variant.
    heavy = os.environ.get("GT_BENCH_HEAVY", "0") == "1"
    if heavy:
        # the heavy batch's larger grid tips the folded tile-256 schedule
        # ~1.2 MB over the scoped-VMEM limit; 192 fits
        os.environ.setdefault("GT_FOLDED_TILE", "192")
    ds = synthetic_powerlaw_dataset(
        "REDDITMULTI5K-heavy" if heavy else "REDDITMULTI5K-like",
        num_graphs=64, mean_nodes=509, seed=0, heavy_tail=heavy,
    )
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=BATCH, num_neighbors=K),
        model=ModelConfig(
            num_timesteps=T,
            num_hidden_layers=1,
            ff_hidden_size=FF,
            compute_dtype="bfloat16",
            # fused Pallas FFN kernel: 12.9 ms/step vs 33.2 ms/step for the
            # XLA path on this workload (v5e, honest completion barrier)
            use_pallas=os.environ.get("GT_USE_PALLAS", "1") == "1",
            # whole-encoder mega-fwd + per-layer-bwd hybrid (ROADMAP item 6,
            # built late round 3): encoder fwd+bwd 9.27 -> 8.34 ms at bench
            # shapes (scripts/bench_hybrid.py)
            use_pallas_whole_encoder=os.environ.get("GT_WHOLE_ENC", "1")
            == "1",
            # fully-fused sample+gather+encode (round-4): bench 3.63M ->
            # 3.74-3.76M edges/s/chip; CV accuracy parity on the exact
            # fused configuration PASSes the gate (MUTAG gap 0.0105, PTC
            # 0.0001 — runs/hybrid_parity_r3.json '+fused' rows) and the
            # deterministic forward matches the two-pass path bit-for-bit
            # (scripts/bench_fused_sampler.py)
            use_fused_sampler=os.environ.get("GT_FUSED_SAMPLER", "1") == "1",
            # stored-residual backward (round-5): the fused forward writes
            # each layer's residuals; the backward reads them instead of
            # recomputing the layer.  Isolated grad loop 8.33 -> 7.54
            # ms/step (runs/stored_bwd_ab.json); grads closer to the f32
            # reference than the recompute path.
            use_stored_bwd=os.environ.get("GT_STORED_BWD", "1") == "1",
            # folded-lane [G, S·D] encoder (round-5): no dense [R, R]
            # attention, every per-slot op a constant-matrix MXU
            # contraction; the last layer runs slot0-only (S× less work).
            # Isolated grad loop 7.53 -> 3.83 ms/step
            # (runs/folded_ab.json).  GT_FOLDED=0 reverts.
            use_folded=os.environ.get("GT_FOLDED", "1") == "1",
        ),
        train=TrainConfig(num_epochs=1),
    )
    # fixed split: all graphs trainable (throughput measurement, not accuracy)
    trainer = SupTrainer(
        ds, cfg, train_idx=np.arange(ds.num_graphs), test_idx=np.arange(8)
    )

    if heavy:
        # the point of the heavy variant is the hub path: assert the fast
        # sampler engaged (no silent fallback) and hubs exist
        assert trainer.nbr_table is not None, "fast sampler did not engage"
        assert int(ds.degrees.max()) > 128, "no hub nodes generated"

    # one fixed batch skeleton; neighborhoods resample on device every step
    batch = trainer.builder.sample()
    edges_per_step = float(np.asarray(batch.edge_mask).sum())

    import jax.random as jr

    # The measured loop is ONE device program (lax.scan over train steps):
    # a single dispatch, so host/tunnel latency cannot pollute the number —
    # this is the loop shape production training uses anyway.
    batch = jax.device_put(batch)
    params, opt_state = trainer.params, trainer.opt_state
    # warmup with the SAME static n_steps: n_steps is a static argnum, so a
    # different length would push the 100-step compile into the timed region
    import jax.numpy as jnp

    params, opt_state, warm_losses = trainer._train_scan(
        params, opt_state, batch, jr.key(1), STEPS, trainer.csr
    )
    float(jnp.sum(warm_losses))  # real completion barrier (see below)

    t0 = time.perf_counter()
    params, opt_state, losses = trainer._train_scan(
        params, opt_state, batch, jr.key(2), STEPS, trainer.csr
    )
    # completion barrier: fetch a VALUE to host.  block_until_ready is not a
    # reliable completion barrier through the remote-TPU relay in this
    # environment — it acknowledges before compute finishes.
    float(jnp.sum(losses))
    dt = time.perf_counter() - t0

    edges_per_s = edges_per_step * STEPS / dt
    print(
        json.dumps(
            {
                "metric": ("sup_u2gnn_train_throughput_redditm5k_heavy"
                           if heavy else
                           "sup_u2gnn_train_throughput_redditm5k_like"),
                "value": round(edges_per_s, 1),
                "unit": "edges/s/chip",
                "vs_baseline": round(edges_per_s / REFERENCE_EDGES_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
