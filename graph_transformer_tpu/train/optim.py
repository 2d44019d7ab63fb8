"""Optimizer construction matching the reference trainer semantics.

The reference uses Adam + global-norm gradient clipping 0.5 + a StepLR with
gamma=0.1 that in practice fires on a *loss plateau*: the scheduler is stepped
once per epoch iff the last epoch loss exceeds the mean of the previous five
(``train_pytorch_U2GNN_Sup.py:145-147,160,209-210``,
``train_utils.py:212-213``).  Here the decay lives as an injected
hyperparameter ``lr_scale`` in the optimizer state, so the trainer can decay
the learning rate without recompiling the jitted step.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import optax


def _scale_by_hyperparam(lr_scale):
    """Multiply updates by the (injected, state-carried) ``lr_scale``."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        return jax.tree_util.tree_map(lambda u: u * lr_scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    learning_rate: float,
    grad_clip_norm: float = 0.5,
) -> optax.GradientTransformation:
    """clip-by-global-norm → Adam(lr) → × lr_scale (plateau decay)."""

    @optax.inject_hyperparams
    def _opt(lr_scale):
        return optax.chain(
            optax.clip_by_global_norm(grad_clip_norm),
            optax.adam(learning_rate),
            _scale_by_hyperparam(lr_scale),
        )

    return _opt(lr_scale=jnp.asarray(1.0, jnp.float32))


def get_lr_scale(opt_state) -> float:
    return float(opt_state.hyperparams["lr_scale"])


def set_lr_scale(opt_state, scale: float):
    """Return opt_state with the injected ``lr_scale`` hyperparameter set."""
    opt_state.hyperparams["lr_scale"] = jnp.asarray(scale, jnp.float32)
    return opt_state


def plateau_lr_step(loss_history: List[float], window: int = 5) -> bool:
    """True iff the LR should decay this epoch: ``epoch > window`` and
    ``loss[-1] > mean(loss[-window-1:-1])``
    (``train_pytorch_U2GNN_Sup.py:209-210``)."""
    if len(loss_history) <= window:
        return False
    recent = loss_history[-window - 1 : -1]
    return loss_history[-1] > sum(recent) / len(recent)
