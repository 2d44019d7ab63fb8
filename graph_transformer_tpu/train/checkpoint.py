"""Orbax checkpointing — a new capability.

The reference constructs TF ``Saver`` objects and ``checkpoints/`` dirs but
never calls ``.save()`` anywhere (SURVEY.md §5: vestigial).  Multi-host runs
need real checkpoint/resume, so the trainers get periodic Orbax saves of
(params, opt_state, epoch, loss history) and ``latest_checkpoint`` resume.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save_checkpoint(
    ckpt_dir: str,
    step: int,
    params: Any,
    opt_state: Any,
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    """Save one step's state; returns the checkpoint path."""
    if not _HAVE_ORBAX:  # pragma: no cover
        raise RuntimeError("orbax-checkpoint unavailable")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": params, "opt_state": opt_state})
    ckptr.wait_until_finished()
    if extra is not None:
        # host-side metadata (epoch counter, loss history) rides alongside —
        # keeping it out of the Orbax tree lets restore targets stay static
        import json

        with open(path + ".extra.json", "w") as f:
            json.dump(
                {
                    k: (np.asarray(v).tolist() if isinstance(v, (np.ndarray, list)) else v)
                    for k, v in extra.items()
                },
                f,
            )
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(
        d for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and os.path.isdir(os.path.join(ckpt_dir, d))
    )
    return os.path.join(os.path.abspath(ckpt_dir), steps[-1]) if steps else None


def restore_checkpoint(path: str, params_like: Any, opt_state_like: Any):
    """Restore (params, opt_state, extra) with the given pytree structures."""
    if not _HAVE_ORBAX:  # pragma: no cover
        raise RuntimeError("orbax-checkpoint unavailable")
    ckptr = ocp.StandardCheckpointer()
    target = {"params": params_like, "opt_state": opt_state_like}
    state = ckptr.restore(path, target=target)
    extra = None
    if os.path.exists(path + ".extra.json"):
        import json

        with open(path + ".extra.json") as f:
            extra = json.load(f)
    return state["params"], state["opt_state"], extra
