"""Pure-JAX log-uniform (Zipfian) candidate sampling, on device.

Replaces the reference's C++/Cython ``LogUniformSampler`` extension
(``U2GNN_pytorch/log_uniform/Log_Uniform_Sampler.cpp``), which runs on the
host and forces a device→host→device round trip every unsupervised step
(``sampled_softmax.py:31,42``).  Here candidate sampling happens inside the
jitted step.

Distribution (``Log_Uniform_Sampler.cpp:14``):

    P(k) = (log(k+2) - log(k+1)) / log(N+1),   k in [0, N)

Unique sampling: the C++ sampler draws i.i.d. and rejects duplicates until
``size`` distinct ids are collected (``Log_Uniform_Sampler.cpp:57-71``).
Keeping the first occurrence of each distinct value of an i.i.d. stream is
*exactly* sequential sampling without replacement (Plackett–Luce), which is
what the Gumbel-top-k trick samples — so ``sample_log_uniform_unique`` is
distribution-exact to the reference, with no data-dependent loop.

Expected counts (``Log_Uniform_Sampler.cpp:23-32``):

    E[count of k among t tries] ≈ 1 - (1-p_k)^t  = -expm1(t * log1p(-p_k))

The C++ sampler reports the *actual* number of tries; with Gumbel-top-k there
is none, so we use the deterministic t* solving E[#unique(t)] = nsampled
(Newton, on host, once per (vocab, nsampled)) — the same estimator TF's
``log_uniform_candidate_sampler`` exposes in expectation.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def log_uniform_probs(vocab_size: int, dtype=jnp.float32) -> jax.Array:
    """[V] candidate probabilities P(k) = (log(k+2)-log(k+1))/log(V+1)."""
    k = jnp.arange(vocab_size, dtype=jnp.float64 if dtype == jnp.float64 else jnp.float32)
    return ((jnp.log(k + 2.0) - jnp.log(k + 1.0)) / math.log(vocab_size + 1.0)).astype(
        dtype
    )


def expected_num_tries(vocab_size: int, nsampled: int, iters: int = 50) -> float:
    """Solve E[#unique after t tries] = sum_k 1-(1-p_k)^t == nsampled for t.

    Deterministic host-side Newton iteration; result is cached by callers and
    baked into the compiled loss as a constant.
    """
    k = np.arange(vocab_size, dtype=np.float64)
    p = (np.log(k + 2.0) - np.log(k + 1.0)) / math.log(vocab_size + 1.0)
    log1mp = np.log1p(-p)
    t = float(nsampled)
    for _ in range(iters):
        e = np.exp(t * log1mp)  # (1-p)^t
        f = np.sum(1.0 - e) - nsampled
        df = np.sum(-log1mp * e)
        if df <= 0:
            break
        step = f / df
        t -= step
        t = max(t, float(nsampled))
        if abs(step) < 1e-9:
            break
    return float(t)


def expected_count(num_tries: float, probs: jax.Array) -> jax.Array:
    """-expm1(t * log1p(-p)) — expected candidate frequency among t tries."""
    return -jnp.expm1(num_tries * jnp.log1p(-probs))


@dataclasses.dataclass(frozen=True)
class LogUniformSpec:
    """Precomputed constants for a (vocab, nsampled) pair."""

    vocab_size: int
    nsampled: int
    num_tries: float

    @staticmethod
    def create(vocab_size: int, nsampled: int) -> "LogUniformSpec":
        return LogUniformSpec(
            vocab_size=vocab_size,
            nsampled=nsampled,
            num_tries=expected_num_tries(vocab_size, nsampled),
        )


@partial(jax.jit, static_argnums=(1, 2))
def sample_log_uniform_unique(
    key: jax.Array, vocab_size: int, nsampled: int
) -> jax.Array:
    """[nsampled] unique candidate ids ~ log-uniform, via Gumbel top-k.

    Exact sampling-without-replacement from P(k); see module docstring for the
    equivalence to the reference's rejection loop.
    """
    logp = jnp.log(log_uniform_probs(vocab_size))
    g = jax.random.gumbel(key, (vocab_size,), dtype=jnp.float32)
    _, ids = jax.lax.top_k(logp + g, nsampled)
    return ids.astype(jnp.int32)


def sample_log_uniform_fast(
    key: jax.Array, vocab_size: int, nsampled: int, oversample: int = 4
) -> tuple[jax.Array, jax.Array]:
    """Cheaper O(M log M) sampler: draw M = oversample*nsampled i.i.d. values
    by CDF inversion (``value = floor(exp(u * log(V+1))) - 1``, matching the
    TF candidate sampler; the C++ uses ``lround(exp(u*log V))-1``,
    ``Log_Uniform_Sampler.cpp:66-67`` — an off-by-rounding variant of the same
    law) and keep the first ``nsampled`` distinct values in draw order.

    Returns (ids[nsampled], valid[nsampled]); ``valid`` is False for slots
    that could not be filled (M draws produced fewer uniques — vanishingly
    rare at oversample>=4).  Use the Gumbel sampler when exactness matters.
    """
    m = oversample * nsampled
    u = jax.random.uniform(key, (m,), dtype=jnp.float32)
    vals = jnp.floor(jnp.exp(u * math.log(vocab_size + 1.0))).astype(jnp.int32) - 1
    vals = jnp.clip(vals, 0, vocab_size - 1)
    # first-occurrence ranks: sort by (value, draw index); first of each run
    # keeps its draw index, duplicates get a large sentinel rank.
    order = jnp.argsort(vals)
    sv = vals[order]
    first = jnp.concatenate([jnp.array([True]), sv[1:] != sv[:-1]])
    rank = jnp.where(first, order, m + order)  # dups pushed past all firsts
    # nsampled smallest ranks = first nsampled distinct values in draw order
    neg_rank = -rank
    _, take = jax.lax.top_k(neg_rank, nsampled)
    ids = vals[order][take]
    valid = rank[take] < m
    return ids, valid
