"""Pure-JAX sampled softmax over node vocabularies.

Rebuilds, on device, the two sampled-softmax variants in the reference:

- ``mode='reference'``: the PyTorch fork's NCE-style loss
  (``sampled_softmax.py:36-56``; Jean et al., P15-1001):
  ``loss_i = -log( exp(u_i·w_label) / Σ_s exp(u_i·w_s) )`` over ``nsampled``
  log-uniform candidates — no bias, no expected-count correction, no
  accidental-hit masking, and the true logit is *not* included in the
  denominator.
- ``mode='tf'``: the TF implementation's clean semantics
  (``tf.nn.sampled_softmax_loss`` at ``model_U2GNN_Unsup_multi.py:56-58``):
  biases, log-expected-count subtraction, accidental-hit masking, softmax CE
  against the true class.

Candidates are drawn on device with the Gumbel-top-k log-uniform sampler
(see ``sampling/log_uniform.py``), eliminating the per-step
device→host→device round trip of the reference
(``sampled_softmax.py:31,42``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from graph_transformer_tpu.sampling.log_uniform import (
    LogUniformSpec,
    expected_count,
    log_uniform_probs,
    sample_log_uniform_fast,
    sample_log_uniform_unique,
)

# Above this vocabulary size the exact Gumbel-top-k sampler (O(V) gumbels +
# top_k over V) loses to the oversample-and-dedup sampler (O(M log M),
# M = 4·nsampled); measured crossover on TPU v5e is well below 64k.
_FAST_SAMPLER_VOCAB_THRESHOLD = 32_768


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SampledSoftmaxParams:
    weight: jax.Array  # [V, D] output embedding table
    bias: jax.Array  # [V] (zeros; unused in 'reference' mode)


def init_sampled_softmax_params(
    key: jax.Array, vocab_size: int, nhid: int, dtype=jnp.float32
) -> SampledSoftmaxParams:
    """Uniform ±sqrt(6/(V+D)) init (``sampled_softmax.py:25-27``);
    zero biases (``model_U2GNN_Unsup_multi.py:54``)."""
    stdv = math.sqrt(6.0 / (vocab_size + nhid))
    return SampledSoftmaxParams(
        weight=jax.random.uniform(key, (vocab_size, nhid), dtype, -stdv, stdv),
        bias=jnp.zeros((vocab_size,), dtype),
    )


def sampled_softmax_loss(
    params: SampledSoftmaxParams,
    key: jax.Array,
    inputs: jax.Array,  # [B, D] projected node vectors
    labels: jax.Array,  # [B] i32 global node ids (the vocab)
    spec: LogUniformSpec,
    mode: str = "tf",
    mask: Optional[jax.Array] = None,  # [B] 1.0 for real rows
) -> jax.Array:
    """Per-example sampled-softmax losses [B] (padding rows zeroed via mask)."""
    if spec.vocab_size > _FAST_SAMPLER_VOCAB_THRESHOLD:
        sample_ids, cand_valid = sample_log_uniform_fast(
            key, spec.vocab_size, spec.nsampled
        )
    else:
        sample_ids = sample_log_uniform_unique(key, spec.vocab_size, spec.nsampled)
        cand_valid = None
    true_w = params.weight[labels]  # [B, D]
    sample_w = params.weight[sample_ids]  # [S, D]
    true_dot = jnp.sum(inputs * true_w, axis=-1)  # [B]
    sample_dot = inputs @ sample_w.T  # [B, S]

    if mode == "reference":
        # -log( exp(true) / Σ_s exp(sample) ) = logsumexp(sample) - true
        if cand_valid is not None:
            sample_dot = jnp.where(cand_valid[None, :], sample_dot, -jnp.inf)
        out = jax.nn.logsumexp(sample_dot, axis=-1) - true_dot
    elif mode == "tf":
        probs = log_uniform_probs(spec.vocab_size)
        true_logit = (
            true_dot
            + params.bias[labels]
            - jnp.log(expected_count(spec.num_tries, probs[labels]))
        )
        sample_logit = (
            sample_dot
            + params.bias[sample_ids][None, :]
            - jnp.log(expected_count(spec.num_tries, probs[sample_ids]))[None, :]
        )
        # accidental hits: candidate equals the example's own label
        hit = sample_ids[None, :] == labels[:, None]
        sample_logit = jnp.where(hit, sample_logit - 1e9, sample_logit)
        if cand_valid is not None:  # unfilled fast-sampler slots
            sample_logit = jnp.where(
                cand_valid[None, :], sample_logit, -jnp.inf
            )
        # softmax CE with the true class prepended as class 0
        all_logits = jnp.concatenate([true_logit[:, None], sample_logit], axis=1)
        out = jax.nn.logsumexp(all_logits, axis=-1) - true_logit
    else:
        raise ValueError(f"unknown sampled-softmax mode {mode!r}")

    if mask is not None:
        out = out * mask
    return out
