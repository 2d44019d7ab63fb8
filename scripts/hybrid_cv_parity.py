"""Accuracy parity of the whole-encoder HYBRID path (mega-fwd +
per-layer-bwd, ops/pallas_u2gnn.py) on full 10-fold CV.

bench.py now runs use_pallas + use_pallas_whole_encoder; per round-2's
verdict the kernel that is benchmarked must be the kernel accuracy is
measured with — so this reruns the README MUTAG/PTC rows on the exact
bench configuration (hybrid kernels, bf16, fast Pallas sampler) via the
fold-vmapped runner and compares to the XLA-f32 numbers in
runs/tenfold_all (RESULTS.md).  Parity bar: |Δmean| ≤ 0.04 (the round-2
threshold, ≈2 test graphs on MUTAG).

Writes runs/hybrid_parity_r3.json.  Run on the real chip.

**This is the re-runnable accuracy gate for kernel changes** (VERDICT r3
item 9): it exits nonzero when any dataset's |gap| exceeds the fold-noise
threshold, so future Pallas work can't silently break accuracy:

    python scripts/hybrid_cv_parity.py --datasets MUTAG   # quick gate
    python scripts/hybrid_cv_parity.py                    # full gate
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_transformer_tpu.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from graph_transformer_tpu.data.tu import load_tu_dataset
from graph_transformer_tpu.train.tenfold_vmap import TenfoldVmapRunner

CONFIGS = {
    "MUTAG": dict(batch=4, K=8, T=4, epochs=50),
    "PTC": dict(batch=4, K=16, T=3, epochs=50),
}


def xla_reference(name):
    path = os.path.join("runs/tenfold_all/results_r2.jsonl")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            if r.get("dataset") == name:
                return r
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datasets", nargs="*", default=list(CONFIGS),
                    choices=list(CONFIGS))
    ap.add_argument("--threshold", type=float, default=0.04,
                    help="|mean gap| gate (~2 MUTAG test graphs)")
    ap.add_argument("--fused_sampler", action="store_true",
                    help="gate the fully-fused sample+gather+encode path "
                         "(use_fused_sampler=True; artifact keys get a "
                         "'+fused' suffix)")
    ap.add_argument("--stored_bwd", action="store_true",
                    help="gate the stored-residual backward on the fused "
                         "path (use_stored_bwd=True; implies "
                         "--fused_sampler; keys get a '+stored' suffix)")
    ap.add_argument("--folded", action="store_true",
                    help="gate the folded-lane encoder on the fused path "
                         "(use_folded=True; implies --fused_sampler; keys "
                         "get a '+folded' suffix)")
    args = ap.parse_args()
    if args.stored_bwd or args.folded:
        args.fused_sampler = True
    out = {}
    for name in args.datasets:
        c = CONFIGS[name]
        ds = load_tu_dataset(name)
        cfg = ExperimentConfig(
            data=DataConfig(batch_size=c["batch"], num_neighbors=c["K"]),
            model=ModelConfig(
                num_timesteps=c["T"], num_hidden_layers=1,
                ff_hidden_size=1024, use_pallas=True,
                use_pallas_whole_encoder=True,
                use_fused_sampler=args.fused_sampler,
                use_stored_bwd=args.stored_bwd,
                use_folded=args.folded,
                compute_dtype="bfloat16",
            ),
            train=TrainConfig(num_epochs=c["epochs"], learning_rate=5e-4),
        )
        kernel = None
        folded_here = False
        if args.folded:
            from graph_transformer_tpu.ops.pallas_folded import (
                folded_shape_ok,
            )

            # the folded path shape-gates (selector constants scale as
            # S²·D); off-gate datasets run the stored fallback and the
            # row must say so
            folded_here = folded_shape_ok(c["K"] + 1, ds.feature_dim)
            kernel = ("folded (sequential CV: the vmapped runner "
                      "exceeds scoped VMEM at this fold width)"
                      if folded_here else "stored-fallback (shape gate)")
        t0 = time.time()
        if folded_here:
            # sequential per-fold CV through SupTrainer — the same
            # model.apply folded dispatch the bench runs
            import dataclasses as _dc

            import numpy as _np

            from graph_transformer_tpu.data.splits import (
                stratified_kfold_indices,
            )
            from graph_transformer_tpu.train.sup_trainer import SupTrainer

            cfg = cfg.replace(train=_dc.replace(cfg.train,
                                                scan_epochs=True))
            accs = []
            for fi, (tr, te) in enumerate(
                stratified_kfold_indices(ds.labels, 10, seed=0)
            ):
                trainer = SupTrainer(ds, cfg, train_idx=tr, test_idx=te)
                assert trainer._tag_table is not None
                b = 0.0
                for _ in range(cfg.train.num_epochs):
                    trainer.train_epoch_stacked()
                    b = max(b, trainer.evaluate())
                accs.append(b)
                print(f"[{name}] fold {fi}: best {b:.4f}", flush=True)
            best = _np.asarray(accs)
            mean, std = float(_np.mean(accs)), float(_np.std(accs))
        else:
            runner = TenfoldVmapRunner(ds, cfg)
            if args.fused_sampler:
                # a '+fused' PASS row must certify the fused kernel, not
                # a silent fallback to the two-pass path
                assert runner._tag_table is not None, (
                    "fused path did not engage (TPU? codebook? "
                    "degree<=128?)"
                )
            best, mean, std = runner.run(
                log_fn=lambda m: print(f"[{name}] {m}", flush=True)
            )
        dt = time.time() - t0
        ref = xla_reference(name)
        gap = abs(mean - ref["mean"]) if ref else None
        out_key = name + ("+folded" if args.folded
                          else "+stored" if args.stored_bwd
                          else "+fused" if args.fused_sampler else "")
        out[out_key] = {
            "hybrid_bf16": {"mean": mean, "std": std, "folds": best.tolist()},
            "xla_f32": ({"mean": ref["mean"], "std": ref["std"]}
                        if ref else None),
            "abs_gap": gap,
            "within_fold_noise": (gap is not None and gap <= args.threshold),
            "config": c,
            "kernel": kernel,
            "seconds": dt,
        }
        print(f"{out_key}: hybrid {mean:.4f}±{std:.4f}"
              + (f" vs xla {ref['mean']:.4f} (gap {gap:.4f})" if ref else ""),
              flush=True)
    os.makedirs("runs", exist_ok=True)
    # merge so a partial --datasets gate doesn't drop previous rows
    path = "runs/hybrid_parity_r3.json"
    prev = {}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
    prev.update(out)
    with open(path, "w") as f:
        json.dump(prev, f, indent=1)
    print(f"wrote {path}")
    failed = [n for n, r in out.items() if not r["within_fold_noise"]]
    if failed:
        print(f"PARITY GATE FAILED: {failed} exceed |gap| {args.threshold}")
        sys.exit(1)
    print("parity gate: PASS")


if __name__ == "__main__":
    main()
