"""Loss functions of the U2GNN family.

- label smoothing + soft-label cross entropy
  (``pytorch_U2GNN_Sup.py:48-60``, ``train_pytorch_U2GNN_Sup.py:140-142``)
- supervised-contrastive (SupCon) loss with adjacency-as-mask
  (``contrastive_loss.py:49-77``; arXiv:2004.11362)
- GAE reconstruction loss: norm-weighted BCE(σ(ZZᵀ), A)
  (``loss_functions.py:41-49``)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def label_smoothing(
    labels: jax.Array, num_classes: int, smoothing: float = 0.1
) -> jax.Array:
    """Soft targets: confidence 1-ε on the true class, ε/(C-1) elsewhere
    (``pytorch_U2GNN_Sup.py:48-60``)."""
    confidence = 1.0 - smoothing
    off = smoothing / (num_classes - 1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    return onehot * (confidence - off) + off


def soft_cross_entropy(
    logits: jax.Array,  # [B, C]
    soft_targets: jax.Array,  # [B, C]
    mask: Optional[jax.Array] = None,  # [B]
) -> jax.Array:
    """mean_B Σ_c -target·log_softmax(logits)
    (``train_pytorch_U2GNN_Sup.py:140-142``)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_ex = -jnp.sum(soft_targets * logp, axis=-1)
    if mask is not None:
        return jnp.sum(per_ex * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.mean(per_ex)


def supcon_loss(
    features: jax.Array,  # [N, D] embeddings
    mask: Optional[jax.Array] = None,  # [N, N] positives (e.g. adjacency)
    labels: Optional[jax.Array] = None,  # [N] — builds mask label_i == label_j
    temperature: float = 1.0,
    dist: Optional[jax.Array] = None,  # precomputed similarity override
    valid: Optional[jax.Array] = None,  # [N] 1.0 for real rows (padding aware)
) -> jax.Array:
    """Supervised contrastive loss, adjacency-as-mask variant.

    Semantics of ``GraphContrastiveLoss.forward`` (``contrastive_loss.py:
    29-77``): pairwise dot logits / τ (or ``-dist`` if given), max-subtracted,
    self-connections masked from both numerator and denominator, mean log-prob
    over positives with an ε=1e-10 guard, negated and averaged.
    """
    n = features.shape[0]
    if dist is not None:
        dots = -dist
    else:
        dots = (features @ features.T) / temperature
    if mask is None:
        if labels is None:
            raise ValueError("need `mask` or `labels`")
        mask = (labels[:, None] == labels[None, :]).astype(jnp.float32)
    mask = mask.astype(jnp.float32)

    logits_mask = 1.0 - jnp.eye(n, dtype=jnp.float32)
    if valid is not None:
        logits_mask = logits_mask * valid[None, :]
    mask = mask * logits_mask

    logits = dots - jax.lax.stop_gradient(jnp.max(dots, axis=1, keepdims=True))
    exp_logits = jnp.exp(logits) * logits_mask
    log_prob = logits - jnp.log(jnp.maximum(jnp.sum(exp_logits, 1, keepdims=True), 1e-30))
    numerator = jnp.sum(mask * log_prob, axis=1)
    denominator = jnp.sum(mask, axis=1) + 1e-10
    mean_log_prob_pos = numerator / denominator
    if valid is not None:
        return -jnp.sum(mean_log_prob_pos * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return -jnp.mean(mean_log_prob_pos)


def multilayer_supcon_loss(
    logits_list: Sequence[jax.Array],  # per graph-layer embeddings [N, D]
    adj_stack: jax.Array,  # [N, N, S] per-layer adjacency masks
    temperature: float = 1.0,
) -> jax.Array:
    """Σ_layers SupCon(embeddings_i, adjacency_i)
    (``loss_functions.py:34-39``)."""
    total = 0.0
    for i, z in enumerate(logits_list):
        total = total + supcon_loss(z, mask=adj_stack[:, :, i], temperature=temperature)
    return total


def gae_loss(
    logits_list: Sequence[jax.Array],  # per-layer embeddings [N, D]
    adj_label: jax.Array,  # [N, N, S] (or broadcastable) target adjacency
    norm: jax.Array,
    weight: Optional[jax.Array] = None,  # positive-class weights, flat
) -> jax.Array:
    """norm · weighted-BCE(σ(ZZᵀ) stacked over layers, A)
    (``loss_functions.py:41-49``)."""
    preds = jnp.stack(
        [jax.nn.sigmoid(z @ z.T) for z in logits_list], axis=2
    ).reshape(-1)
    target = adj_label.reshape(-1)
    eps = 1e-7
    preds = jnp.clip(preds, eps, 1.0 - eps)
    bce = -(target * jnp.log(preds) + (1.0 - target) * jnp.log(1.0 - preds))
    if weight is not None:
        bce = bce * weight.reshape(-1)
    return norm * jnp.mean(bce)
