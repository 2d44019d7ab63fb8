"""Roofline accounting for the hot kernels at the bench shapes.

BASELINE.json asks for "SpMM/SDDMM at roofline per chip"; BENCH reports
edges/s — this script connects the two: an analytic FLOP/HBM-byte model of
each component of the benchmark train step (``bench.py`` shapes:
REDDITMULTI5K-like batch 16, K=8, T=4, ff 1024, bf16, fused Pallas encoder
layer), measured per-component step times on the real chip, and the
achieved-vs-peak fractions against TPU v5e ceilings.

v5e single-chip peaks (public spec): 197 TFLOP/s bf16 MXU, 819 GB/s HBM.

Components measured (each as a 100-iteration ``lax.scan``, one dispatch,
value-fetch completion barrier — see BASELINE.md for why
``block_until_ready`` is not trusted here):

1. ``sample``   — on-device neighborhood resampling (CSR gathers + PRNG)
2. ``fwd``      — model forward (gathers + T fused encoder layers + pool)
3. ``step``     — full train step (fwd + bwd + Adam), the bench workload

The analytic model prints, per component, min time at the compute bound and
at the bandwidth bound; the binding constraint is the roofline. The ratio
measured/roofline says how much is left on the table and where.

Run (real chip, ~3 min): ``python scripts/roofline.py``
Writes ``runs/roofline.json``.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_FLOPS_BF16 = 197e12  # v5e MXU, bf16
PEAK_HBM_BPS = 819e9  # v5e HBM bandwidth

BATCH, K, T, FF = 16, 8, 4, 1024  # bench.py shapes
STEPS = 100


def analytic_model(n_pad: int, total_nodes: int, d: int, feat_bytes: int = 2):
    """FLOPs and HBM bytes per train step, by component.

    Counted at the algorithm level (what a perfect implementation must move
    and multiply), not at the XLA-op level — that is the point of a
    roofline: the gap to it includes every materialized intermediate.
    """
    S = K + 1
    R = n_pad * S  # encoder rows per layer ([N·S, D] node-major)

    # --- fused encoder layer, one timestep, forward ---
    # attention (dense block-masked form the kernel actually runs):
    #   qkv: R·D·3D·2 ; scores+ctx: 2·R·Rtile·D·2 (Rtile≈504 dense rows);
    #   out-proj: R·D·D·2 ; FFN: R·D·FF·2 + R·FF·D·2
    from graph_transformer_tpu.ops.pallas_encoder import tile_rows

    Rt = tile_rows(S)
    attn_flops = 2 * (R * d * 3 * d) + 2 * (2 * R * Rt * d) + 2 * (R * d * d)
    ffn_flops = 2 * (R * d * FF) * 2
    enc_fwd_flops = (attn_flops + ffn_flops) * T
    # HBM per timestep: read x2d + write out (+ weights re-read per tile)
    n_tiles = max(1, R // Rt)
    w_bytes = (3 * d * d + d * d + 2 * d * FF + FF + 5 * d) * feat_bytes
    enc_fwd_bytes = (2 * R * d * feat_bytes + n_tiles * w_bytes) * T

    # backward recomputes the forward and streams grads: ~2× fwd FLOPs extra
    enc_bwd_flops = 2 * enc_fwd_flops
    enc_bwd_bytes = 2 * enc_fwd_bytes

    # --- neighborhood gather x[neigh] (once per U2GNN layer; k=1 here):
    # random row gather, bandwidth-only ---
    gather_bytes = R * d * feat_bytes + n_pad * S * 4

    # --- on-device resampling: K random draws/node + CSR row gathers ---
    sample_bytes = n_pad * (S * 4 + 4 + K * 4)  # neigh writes + offsets + ids

    # --- pooling segment-sum + head (tiny) ---
    pool_flops = 2 * n_pad * d
    pool_bytes = n_pad * d * feat_bytes

    comps = {
        "encoder_fwd": (enc_fwd_flops, enc_fwd_bytes),
        "encoder_bwd": (enc_bwd_flops, enc_bwd_bytes),
        "gather": (0, gather_bytes),
        "sample": (0, sample_bytes),
        "pool+head": (pool_flops, pool_bytes),
    }
    return comps


def roofline_time(flops: float, bytes_: float) -> float:
    return max(flops / PEAK_FLOPS_BF16, bytes_ / PEAK_HBM_BPS)


def main():
    import jax
    import jax.numpy as jnp

    from graph_transformer_tpu.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
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
            compute_dtype="bfloat16",
            use_pallas=os.environ.get("GT_USE_PALLAS", "1") == "1",
            # round-5: measure the SHIPPED bench configuration
            use_pallas_whole_encoder=True, use_fused_sampler=True,
            use_stored_bwd=True, use_folded=True,
        ),
        train=TrainConfig(num_epochs=1),
    )
    trainer = SupTrainer(
        ds, cfg, train_idx=np.arange(ds.num_graphs), test_idx=np.arange(8)
    )
    batch = trainer.builder.sample()
    n_pad = batch.x.shape[0]
    d = batch.x.shape[1]
    edges = float(np.asarray(batch.edge_mask).sum())
    batch = jax.device_put(batch)
    csr = trainer.csr
    model = trainer.model

    def timed(fn, *args):
        out = fn(*args)  # compile + warm
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        return (time.perf_counter() - t0) / STEPS

    import functools

    @jax.jit
    def scan_sample(key):
        def body(c, i):
            kk = jax.random.fold_in(key, i)
            neigh = resample_batch_neighbors(
                kk, csr, batch.node_gidx, batch.node_mask, K, ds.num_nodes
            )
            return c + jnp.sum(neigh), None

        out, _ = jax.lax.scan(body, jnp.int32(0), jnp.arange(STEPS))
        return out

    @jax.jit
    def scan_fwd(params, key):
        def body(c, i):
            kk = jax.random.fold_in(key, i)
            k_s, k_d = jax.random.split(kk)
            neigh = resample_batch_neighbors(
                k_s, csr, batch.node_gidx, batch.node_mask, K, ds.num_nodes
            )
            b = dataclasses.replace(batch, neigh=neigh)
            scores = model.apply(params, b, rng=k_d)
            return c + jnp.sum(scores.astype(jnp.float32)), None

        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
        return out

    t_sample = timed(scan_sample, jax.random.key(0))
    t_fwd = timed(scan_fwd, trainer.params, jax.random.key(1))

    # full step: _train_scan donates (params, opt_state), so rebind between
    # the warmup and the timed call instead of using timed()
    params, opt_state = trainer.params, trainer.opt_state
    params, opt_state, losses = trainer._train_scan(
        params, opt_state, batch, jax.random.key(2), STEPS, csr
    )
    float(jnp.sum(losses))
    t0 = time.perf_counter()
    params, opt_state, losses = trainer._train_scan(
        params, opt_state, batch, jax.random.key(3), STEPS, csr
    )
    float(jnp.sum(losses))
    t_step = (time.perf_counter() - t0) / STEPS

    comps = analytic_model(n_pad, ds.num_nodes, d)
    total_flops = sum(f for f, _ in comps.values())
    total_bytes = sum(b for _, b in comps.values())

    fwd_keys = ("encoder_fwd", "gather", "sample", "pool+head")
    fwd_flops = sum(comps[k][0] for k in fwd_keys)
    fwd_bytes = sum(comps[k][1] for k in fwd_keys)

    rows = []
    print(f"# shapes: n_pad={n_pad} S={K+1} D={d} FF={FF} T={T} "
          f"rows/layer={n_pad*(K+1)} edges/step={edges:.0f}")
    print(f"# v5e peaks: {PEAK_FLOPS_BF16/1e12:.0f} TFLOP/s bf16, "
          f"{PEAK_HBM_BPS/1e9:.0f} GB/s HBM")
    print(f"{'component':12s} {'GFLOP':>8s} {'MB':>8s} {'roofline':>10s} "
          f"{'measured':>10s} {'% roof':>7s} {'bound':>6s}")

    def report(name, flops, bytes_, measured):
        tr = roofline_time(flops, bytes_)
        bound = "flops" if flops / PEAK_FLOPS_BF16 > bytes_ / PEAK_HBM_BPS else "mem"
        pct = 100.0 * tr / measured if measured else float("nan")
        print(f"{name:12s} {flops/1e9:8.2f} {bytes_/1e6:8.2f} "
              f"{tr*1e6:8.1f}µs {measured*1e6:8.1f}µs {pct:6.1f}% {bound:>6s}")
        rows.append({
            "component": name, "gflop": round(flops / 1e9, 3),
            "mb": round(bytes_ / 1e6, 3), "roofline_us": round(tr * 1e6, 2),
            "measured_us": round(measured * 1e6, 2),
            "pct_of_roofline": round(pct, 2), "bound": bound,
        })

    report("sample", *comps["sample"], t_sample)
    report("fwd", fwd_flops, fwd_bytes, t_fwd)
    report("full_step", total_flops, total_bytes, t_step)
    eps = edges / t_step
    print(f"# edges/s at measured step: {eps/1e6:.2f}M "
          f"(roofline-possible: {edges/roofline_time(total_flops, total_bytes)/1e6:.0f}M)")

    os.makedirs("runs", exist_ok=True)
    with open("runs/roofline.json", "w") as f:
        json.dump({
            "shapes": {"n_pad": n_pad, "S": K + 1, "D": d, "FF": FF, "T": T},
            "peaks": {"flops_bf16": PEAK_FLOPS_BF16, "hbm_bps": PEAK_HBM_BPS},
            "rows": rows, "edges_per_step": edges,
            "edges_per_s_measured": eps,
        }, f, indent=1)
    print("# wrote runs/roofline.json")


if __name__ == "__main__":
    main()
