"""A/B: Pallas fast sampler in the unsupervised trainer (ROADMAP r3 item 7).

Times one stacked-epoch dispatch (UnsupTrainer._train_scan_stacked) at the
bench-like workload on the real chip, with the fast path on vs forced off
(monkeypatched table builder).  Run: timeout 590 python scripts/bench_unsup_sampler.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH, K, T, FF, STEPS = 16, 8, 1, 1024, 64


def main():
    import jax
    import jax.numpy as jnp

    from graph_transformer_tpu.config import (
        DataConfig, ExperimentConfig, ModelConfig, TrainConfig,
    )
    from graph_transformer_tpu.data.tu import synthetic_powerlaw_dataset
    from graph_transformer_tpu.train import unsup_trainer as ut

    ds = synthetic_powerlaw_dataset(
        "REDDITMULTI5K-like", num_graphs=64, mean_nodes=509, seed=0
    )
    cfg = ExperimentConfig(
        data=DataConfig(batch_size=BATCH, num_neighbors=K),
        model=ModelConfig(
            num_timesteps=T, num_hidden_layers=1, ff_hidden_size=FF,
            sampled_num=512, compute_dtype="bfloat16", use_pallas=True,
        ),
        train=TrainConfig(num_epochs=1),
    )

    def run(tag, force_slow, use_cfg=None):
        orig = ut.build_neighbor_table
        if force_slow:
            ut.build_neighbor_table = lambda _ds: None
        try:
            tr = ut.UnsupTrainer(ds, use_cfg or cfg)
        finally:
            ut.build_neighbor_table = orig
        print(f"{tag}: fast={tr.nbr_table is not None}")
        batches = [tr.builder.sample() for _ in range(STEPS)]
        stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *batches)
        stacked = jax.device_put(stacked)
        edges = float(sum(np.asarray(b.edge_mask).sum() for b in batches))

        import jax.random as jr
        p, s = tr.params, tr.opt_state
        p, s, tot = tr._train_scan_stacked(p, s, stacked, jr.key(1), tr.csr)
        float(tot)  # compile + warm (value fetch = completion barrier)
        t0 = time.perf_counter()
        p, s, tot = tr._train_scan_stacked(p, s, stacked, jr.key(2), tr.csr)
        tot = float(tot)
        dt = time.perf_counter() - t0
        eps = edges / dt
        print(f"{tag}: {dt / STEPS * 1e3:8.3f} ms/step  {eps / 1e6:.3f}M edges/s  loss={tot:.1f}")

    run("slow (XLA CSR)", True)
    run("fast (pallas) ", False)
    # round-5: fused sample+gather+encode with the folded encoder — the
    # unsup z is the kernel's slot-0 output
    import dataclasses as _dc

    fused_cfg = cfg.replace(model=_dc.replace(
        cfg.model, use_pallas_whole_encoder=True, use_fused_sampler=True,
        use_stored_bwd=True, use_folded=True))
    run("fused+folded  ", False, fused_cfg)


if __name__ == "__main__":
    main()
