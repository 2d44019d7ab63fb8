"""Multi-process (multi-host) bootstrap.

The reference is strictly single-process/single-device (SURVEY.md §2.3: no
torch.distributed, no NCCL/MPI anywhere; the one multi-GPU-relevant t2t flag
is explicitly disabled, ``universal_transformer_modified.py:360``).  This
module is new capability: the ``jax.distributed`` entry point that turns N
cooperating processes — N TPU hosts over DCN, or N CPU processes in the
tests — into one JAX cluster whose devices a single GSPMD mesh spans.

Design (scaling-book recipe):

- every process calls :func:`initialize_from_env` first; afterwards
  ``jax.devices()`` is the *global* device list and ``jax.local_devices()``
  the process-local slice;
- :func:`make_global_mesh` lays the mesh out hierarchically: the ``data``
  axis spans processes (DCN — it carries only the gradient all-reduce, one
  [P]-sized message per step), the ``model`` axis stays intra-process (ICI —
  it carries per-layer activation collectives);
- feeds use :func:`host_local_array`: each process materializes only its
  addressable shards of the globally-sharded array.

Launchers: ``scripts/bench_scaling.py --multiprocess N`` forks N local CPU
processes (the same code a per-host launcher runs on a pod);
``tests/test_multiprocess.py`` proves a 2-process cluster trains the GSPMD
step to the same loss as single-process.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graph_transformer_tpu.parallel.mesh import make_mesh

ENV_COORDINATOR = "GT_COORDINATOR"  # "host:port" of process 0
ENV_NUM_PROCESSES = "GT_NUM_PROCESSES"
ENV_PROCESS_ID = "GT_PROCESS_ID"


def initialize_from_env(timeout_s: int = 120) -> bool:
    """Initialize ``jax.distributed`` from ``GT_*`` environment variables.

    Returns True when multi-process initialization ran, False in the
    single-process case (no ``GT_COORDINATOR`` set) — callers proceed
    identically either way.  On a real TPU pod slice where the runtime
    provides cluster metadata, calling ``jax.distributed.initialize()`` with
    no arguments autodetects; the env path exists so CPU test clusters and
    bare-metal launches work too.
    """
    coord = os.environ.get(ENV_COORDINATOR)
    if not coord:
        return False
    num_processes = int(os.environ[ENV_NUM_PROCESSES])
    process_id = int(os.environ[ENV_PROCESS_ID])
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=num_processes,
        process_id=process_id,
        initialization_timeout=timeout_s,
    )
    return True


def make_global_mesh(
    model_parallel: int = 1,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Global device mesh; DCN-aware when multiple processes are attached.

    Multi-process: ``mesh_utils.create_hybrid_device_mesh`` keeps the
    ``model`` axis (and the intra-host part of ``data``) on each process's
    own devices (ICI) and stacks processes along ``data`` (DCN) — the
    gradient all-reduce is the only inter-host collective.
    Single-process: plain :func:`~graph_transformer_tpu.parallel.mesh.make_mesh`.
    """
    if jax.process_count() > 1:
        from jax.experimental import mesh_utils

        n_local = jax.local_device_count()
        if n_local % model_parallel != 0:
            raise ValueError(
                f"local device count {n_local} not divisible by "
                f"model_parallel={model_parallel} (the model axis must stay "
                "intra-process: DCN is too slow for per-layer collectives)"
            )
        ici = (n_local // model_parallel, model_parallel)
        dcn = (jax.process_count(), 1)
        try:
            devices = mesh_utils.create_hybrid_device_mesh(
                ici, dcn, devices=jax.devices()
            )
        except ValueError:
            # non-TPU devices carry no slice_index (CPU test clusters);
            # group by process manually — same hierarchy: the data axis's
            # outer blocks are whole processes, each model group stays
            # inside one process (n_local % model_parallel == 0 above)
            devs = sorted(
                jax.devices(), key=lambda d: (d.process_index, d.id)
            )
            devices = np.asarray(devs).reshape(
                len(devs) // model_parallel, model_parallel
            )
        return Mesh(devices, axis_names)
    return make_mesh(model_parallel)


def host_local_array(
    global_np: np.ndarray, mesh: Mesh, pspec: P
) -> jax.Array:
    """Build a globally-sharded ``jax.Array`` from a host copy of the data.

    Every process holds the same full numpy array (fine for the TU-scale
    datasets; REDDIT-scale feeds should pass a callback that reads only the
    requested index range) and contributes exactly its addressable shards —
    no inter-process data movement.
    """
    sharding = NamedSharding(mesh, pspec)
    return jax.make_array_from_callback(
        global_np.shape, sharding, lambda idx: global_np[idx]
    )


def put_tree(tree: Any, mesh: Mesh, spec_tree: Any) -> Any:
    """Multi-process-safe ``device_put`` of a numpy pytree onto the mesh."""
    return jax.tree_util.tree_map(
        lambda x, s: host_local_array(np.asarray(x), mesh, s),
        tree,
        spec_tree,
    )
