"""Log-uniform candidate sampler micro-benchmark.

Capability parity with the reference's only benchmark harness
(``U2GNN_pytorch/log_uniform/test.py``: times the C++ unique sampler vs
numpy vs ``torch.multinomial`` at N=793,471 drawing 8,192 unique ids).
Compares, at the same sizes:

- our on-device Gumbel top-k sampler (jitted, steady-state)
- numpy host sampling w/ rejection to unique (the reference's numpy arm)
- torch.multinomial without replacement (the reference's torch arm)
- the native C++ sampler via ctypes, when built (see native/)

Run: python scripts/bench_sampler.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N, SIZE, REPS = 793_471, 8_192, 10


def bench_jax():
    import jax

    from graph_transformer_tpu.sampling.log_uniform import sample_log_uniform_unique

    key = jax.random.key(0)
    ids = sample_log_uniform_unique(key, N, SIZE)  # compile
    ids.block_until_ready()
    t0 = time.perf_counter()
    for i in range(REPS):
        ids = sample_log_uniform_unique(jax.random.fold_in(key, i), N, SIZE)
    ids.block_until_ready()
    return (time.perf_counter() - t0) / REPS


def bench_numpy():
    probs = (np.log(np.arange(N, dtype=np.float64) + 2)
             - np.log(np.arange(N, dtype=np.float64) + 1)) / np.log(N + 1)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    for _ in range(REPS):
        seen = set()
        while len(seen) < SIZE:
            draw = rng.choice(N, size=SIZE, p=probs)
            seen.update(draw.tolist())
        np.fromiter(iter(seen), dtype=np.int64, count=SIZE)
    return (time.perf_counter() - t0) / REPS


def bench_torch():
    import torch

    k = torch.arange(N, dtype=torch.float64)
    probs = ((k + 2).log() - (k + 1).log()) / float(np.log(N + 1))
    t0 = time.perf_counter()
    for _ in range(REPS):
        torch.multinomial(probs, SIZE, replacement=False)
    return (time.perf_counter() - t0) / REPS


def bench_native():
    try:
        from graph_transformer_tpu.native import log_uniform_native as nat
    except Exception:
        return None
    if not nat.available():
        return None
    s = nat.LogUniformSampler(N)
    t0 = time.perf_counter()
    for _ in range(REPS):
        s.sample_unique(SIZE)
    return (time.perf_counter() - t0) / REPS


def main():
    print(f"unique log-uniform sampling: {SIZE} of N={N}, mean of {REPS} reps")
    for name, fn in [
        ("jax on-device (Gumbel top-k)", bench_jax),
        ("numpy host rejection", bench_numpy),
        ("torch.multinomial", bench_torch),
        ("native C++ (ctypes)", bench_native),
    ]:
        try:
            dt = fn()
        except Exception as e:  # keep the harness running if one arm breaks
            print(f"  {name:32s}: failed ({type(e).__name__}: {e})")
            continue
        if dt is None:
            print(f"  {name:32s}: unavailable")
        else:
            print(f"  {name:32s}: {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
