"""Multi-process (2-process CPU cluster) distributed-training test.

Proves the code that would run on 2 TPU hosts exists and works: two OS
processes join one ``jax.distributed`` cluster (2 local CPU devices each →
4 global), the GSPMD train step runs over the global mesh with the gradient
all-reduce crossing the process boundary, and the loss sequence matches a
single-process run of the identical seeded trial.

The reference has no distributed path at all (SURVEY.md §2.3); this is the
CPU-cluster stand-in JAX supports for exactly this purpose.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def mp_results(tmp_path_factory):
    """Launch the 2-process cluster once; yield both processes' reports."""
    tmp = tmp_path_factory.mktemp("mp")
    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        out = tmp / f"p{pid}.json"
        outs.append(out)
        env = dict(
            os.environ,
            PALLAS_AXON_POOL_IPS="",
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            GT_COORDINATOR=f"127.0.0.1:{port}",
            GT_NUM_PROCESSES="2",
            GT_PROCESS_ID=str(pid),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, "--out", str(out)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(stdout)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    return [json.loads(out.read_text()) for out in outs]


def test_two_process_cluster_forms(mp_results):
    for rec in mp_results:
        assert rec["multi"] is True
        assert rec["process_count"] == 2
        assert rec["device_count"] == 4  # global
        assert rec["local_device_count"] == 2  # per process
    assert {r["process_id"] for r in mp_results} == {0, 1}


def test_two_process_losses_agree_across_processes(mp_results):
    a, b = (r["losses"] for r in mp_results)
    np.testing.assert_allclose(a, b, rtol=0, atol=0)  # replicated scalar
    assert all(np.isfinite(a))


def test_two_process_matches_single_process(mp_results):
    """The 2-process global mesh computes the same seeded trial as one
    process with 4 local devices (reduction order may differ -> tolerance)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import jax

    import mp_worker

    from graph_transformer_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(1, devices=jax.devices()[:4])
    want = mp_worker.run_trial(mesh)
    np.testing.assert_allclose(mp_results[0]["losses"], want, rtol=1e-4)


def test_make_global_mesh_single_process():
    """Single-process fallback: plain (data, model) mesh over local devices."""
    import jax

    from graph_transformer_tpu.parallel.bootstrap import make_global_mesh

    mesh = make_global_mesh(model_parallel=2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["model"] == 2
    assert mesh.shape["data"] * 2 == len(jax.devices())


def test_put_tree_places_and_shards():
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from graph_transformer_tpu.parallel.bootstrap import (
        host_local_array,
        put_tree,
    )
    from graph_transformer_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(1, devices=jax.devices()[:4])
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    arr = host_local_array(x, mesh, P("data", None))
    np.testing.assert_allclose(np.asarray(arr), x)
    assert len(arr.sharding.device_set) == 4

    tree = {"a": x, "b": np.float32(3.0)}
    placed = put_tree(tree, mesh, {"a": P("data", None), "b": P()})
    np.testing.assert_allclose(np.asarray(placed["a"]), x)
    assert float(placed["b"]) == 3.0


def test_initialize_from_env_noop_without_coordinator(monkeypatch):
    from graph_transformer_tpu.parallel import bootstrap

    monkeypatch.delenv(bootstrap.ENV_COORDINATOR, raising=False)
    assert bootstrap.initialize_from_env() is False
