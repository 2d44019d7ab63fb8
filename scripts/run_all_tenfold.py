"""Full 10-fold CV on every TU dataset in the reference checkout.

The BASELINE north star asks for 10-fold accuracy on all TU datasets; the
fold-vmapped runner (train/tenfold_vmap.py) makes that affordable on one
chip — all 10 folds train as one device program per epoch.

Config: the reference README publishes per-dataset configs only for
IMDBBINARY and PTC (`README.md:37-39`); every other dataset runs the
IMDBBINARY-shaped config (batch 4, K=8, T=4, ff 1024, lr 5e-4, 50 epochs).
Appends one JSON line per dataset to --out (resumable: finished datasets
are skipped).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from graph_transformer_tpu.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from graph_transformer_tpu.data.tu import load_tu_dataset
from graph_transformer_tpu.train.tenfold_vmap import TenfoldVmapRunner

# dataset -> (num_neighbors K, num_timesteps T, batch_size);
# README.md:37-39 for IMDBBINARY/PTC, IMDBBINARY-shaped default elsewhere.
# NCI1/NCI109 (4.1k graphs each — no published config) run batch 16: 4x
# fewer steps/epoch at ~equal accuracy (bs16 scored above the bs4 base on
# the MUTAG sweep), keeping the full matrix inside the round's chip budget.
CONFIGS = {
    "MUTAG": (8, 4, 4),
    "PTC": (16, 3, 4),
    "PROTEINS": (8, 4, 4),
    "ENZYMES": (8, 4, 4),
    "IMDBBINARY": (8, 4, 4),
    "IMDBMULTI": (8, 4, 4),
    "NCI1": (8, 4, 16),
    "NCI109": (8, 4, 16),
}


def run_one(name: str, runner: str, num_epochs: int, out: str,
            kernels: str = "xla") -> None:
    """Run one dataset's full CV and append the result line to ``out``.

    ``kernels='bench'``: the shipped fast-path configuration (bf16 Pallas
    hybrid + fused sampler + stored-residual backward; folded is left off
    because the fold-VMAPPED runner exceeds scoped VMEM with it at D>4 —
    the folded kernel's own CV gate runs sequentially in
    scripts/hybrid_cv_parity.py --folded)."""
    K, T, B = CONFIGS[name]
    mkw = {}
    if kernels == "bench":
        mkw = dict(use_pallas=True, use_pallas_whole_encoder=True,
                   use_fused_sampler=True, use_stored_bwd=True,
                   compute_dtype="bfloat16")
    cfg = ExperimentConfig(
        data=DataConfig(dataset=name, batch_size=B, num_neighbors=K),
        model=ModelConfig(
            num_timesteps=T, num_hidden_layers=1, ff_hidden_size=1024,
            **mkw,
        ),
        train=TrainConfig(learning_rate=5e-4, num_epochs=num_epochs),
    )
    ds = load_tu_dataset(name)
    t1 = time.time()
    if runner == "ondevice":
        from graph_transformer_tpu.train.cv_ondevice import run_cv_on_device

        accs, mean, std = run_cv_on_device(ds, cfg)
    else:
        accs, mean, std = TenfoldVmapRunner(ds, cfg).run(
            log_fn=lambda s: print(f"  [{name}] {s}", flush=True)
        )
    rec = {
        "dataset": name,
        "mean": round(mean, 4),
        "std": round(std, 4),
        "accs": [round(float(a), 4) for a in accs],
        "K": K,
        "T": T,
        "batch": B,
        "epochs": num_epochs,
        "runner": runner,
        "kernels": kernels,
        "wall_s": round(time.time() - t1, 1),
    }
    with open(out, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _wait_for_device(timeout_s: float = 1800.0) -> bool:
    """Block until a tiny device computation succeeds in a fresh process
    (the remote TPU worker takes minutes to restart after a crash)."""
    import subprocess
    import sys as _sys

    probe = "import jax,jax.numpy as jnp; print(float(jnp.sum(jnp.ones(8))))"
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        try:
            r = subprocess.run(
                [_sys.executable, "-c", probe],
                capture_output=True,
                timeout=300,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass  # init hang while the worker restarts — keep polling
        time.sleep(30)
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/tenfold_all/results.jsonl")
    ap.add_argument("--datasets", default=",".join(CONFIGS))
    ap.add_argument("--num_epochs", default=50, type=int)
    ap.add_argument("--budget_s", default=10**9, type=float)
    ap.add_argument("--runner", default="ondevice", choices=["vmap", "ondevice"])
    ap.add_argument("--single", default=None, help="(internal) run one "
                    "dataset in-process and exit")
    ap.add_argument("--kernels", default="xla", choices=["xla", "bench"],
                    help="'bench' = the shipped fast-path kernels (bf16 "
                         "Pallas + fused sampler + stored backward)")
    args = ap.parse_args()
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)

    if args.single:
        run_one(args.single, args.runner, args.num_epochs, args.out,
                kernels=args.kernels)
        return

    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            done = {json.loads(line)["dataset"] for line in f}

    # per-dataset subprocess isolation: a TPU-worker crash (observed on
    # whole-CV single dispatches that run many minutes) kills only that
    # dataset's attempt; the loop waits for the worker to restart and
    # retries once with the per-epoch-dispatch vmap runner.
    import subprocess
    import sys as _sys

    t0 = time.time()
    for name in args.datasets.split(","):
        if name in done:
            print(f"skip {name} (done)", flush=True)
            continue
        if time.time() - t0 > args.budget_s:
            print("budget reached", flush=True)
            break
        for attempt, runner in enumerate([args.runner, "vmap"]):
            cmd = [
                _sys.executable, os.path.abspath(__file__),
                "--single", name, "--runner", runner,
                "--num_epochs", str(args.num_epochs),
                "--out", args.out, "--kernels", args.kernels,
            ]
            r = subprocess.run(cmd)
            if r.returncode == 0:
                break
            print(
                f"[{name}] {runner} runner failed (rc {r.returncode}); "
                "waiting for device...",
                flush=True,
            )
            if not _wait_for_device():
                print("device did not come back; aborting", flush=True)
                return


if __name__ == "__main__":
    main()
