"""Device-mesh construction.

The reference has no distributed support at all (SURVEY.md §2.3); this module
is new capability.  Axes:

- ``data``: graph/node-axis parallelism — each shard owns a slice of the
  padded node/edge axis of the block-diagonal batch graph.
- ``model``: tensor parallelism of the feed-forward weights (ff_hidden is the
  only dimension big enough to split: 1024 in the README configs).

On a multi-host slice, ``jax.distributed.initialize()`` must run first; the
mesh is then built over ``jax.devices()`` so the data axis spans hosts (DCN)
and the model axis stays intra-host (ICI), which is the right hierarchy for
the collectives each axis carries.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_shape_for(
    n_devices: int, model_parallel: int = 1
) -> Tuple[int, int]:
    """(data, model) mesh shape for ``n_devices`` total."""
    if n_devices % model_parallel != 0:
        raise ValueError(
            f"n_devices={n_devices} not divisible by model_parallel={model_parallel}"
        )
    return (n_devices // model_parallel, model_parallel)


def make_mesh(
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    shape = mesh_shape_for(len(devices), model_parallel)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)
