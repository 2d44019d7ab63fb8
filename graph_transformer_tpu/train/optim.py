"""Optimizer construction matching the reference trainer semantics.

The reference uses Adam + global-norm gradient clipping 0.5 + a
``StepLR(step_size=num_batches_per_epoch, gamma=0.1)`` whose ``.step()`` is
called once per epoch iff the last epoch loss exceeds the mean of the
previous five (``train_pytorch_U2GNN_Sup.py:146-147,209-210``,
``train_utils.py:151-152,212-213``).  Torch's StepLR decays the LR only once
per ``step_size`` calls to ``.step()`` — so with ``step_size =
num_batches_per_epoch`` (e.g. 43 for a MUTAG train fold at batch 4) a decay
needs 43 *plateau epochs*, which a 50-epoch run essentially never reaches:
the reference effectively trains at constant LR.  :class:`PlateauStepLR`
reproduces exactly that gating (``lr = lr0 · gamma^(n_plateau_steps //
step_size)``).  The decay lives as an injected hyperparameter ``lr_scale``
in the optimizer state, so the trainer can change the learning rate without
recompiling the jitted step.
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
    """True iff the plateau condition fires this epoch: ``epoch > window``
    and ``loss[-1] > mean(loss[-window-1:-1])``
    (``train_pytorch_U2GNN_Sup.py:209-210``).  This is the *scheduler.step()
    trigger*, not the decay itself — see :class:`PlateauStepLR`."""
    if len(loss_history) <= window:
        return False
    recent = loss_history[-window - 1 : -1]
    return loss_history[-1] > sum(recent) / len(recent)


class PlateauStepLR:
    """Reference LR schedule: plateau-gated ``StepLR``.

    ``scheduler.step()`` is invoked once per plateau epoch
    (``train_pytorch_U2GNN_Sup.py:209-210``), and
    ``StepLR(step_size=num_batches_per_epoch, gamma=0.1)``
    (``:146-147``) decays the LR only when the cumulative ``.step()`` count
    crosses a multiple of ``step_size``:

        ``lr_scale = gamma ** (num_plateau_steps // step_size)``

    With ``step_size = num_batches_per_epoch`` ≥ the epoch budget this means
    *no decay ever fires* in the reference's 50-epoch runs — the schedule is
    effectively constant-LR, and this class reproduces that faithfully.
    """

    def __init__(self, step_size: int, gamma: float = 0.1, window: int = 5):
        self.step_size = max(1, int(step_size))
        self.gamma = float(gamma)
        self.window = int(window)
        self.num_steps = 0

    @property
    def scale(self) -> float:
        return self.gamma ** (self.num_steps // self.step_size)

    def update(self, loss_history: List[float]) -> float:
        """Advance one epoch given the loss history (last entry = this
        epoch); returns the current ``lr_scale``."""
        if plateau_lr_step(loss_history, self.window):
            self.num_steps += 1
        return self.scale
