"""Multi-process (DCN-shaped) distributed tests.

The reference has NO distributed training (explicit TODO,
/root/reference/README.md:59). This framework's multi-host story is
jax.distributed.initialize + a mesh spanning processes; these tests run it
for real with 2 local processes over the CPU backend and gloo cross-process
collectives — the same code path (coordination service, global devices,
jit-inserted all-reduce over a process-spanning mesh) a TPU pod uses over
DCN, minus the fabric.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

pid = int(sys.argv[1]); port = sys.argv[2]
from layoutdit_tpu.config.constructs import MeshConfig
from layoutdit_tpu.parallel.mesh import (
    batch_sharding, build_mesh, maybe_distributed_init, replicated_sharding,
)

cfg = MeshConfig(
    enable_distributed_init=True,
    coordinator_address=f"localhost:{port}",
    num_processes=2,
    process_id=pid,
)
maybe_distributed_init(cfg)
assert jax.distributed.is_initialized()
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2  # one cpu device per process, both visible

import jax.numpy as jnp
import numpy as np
mesh = build_mesh(MeshConfig(data_parallel=2, model_parallel=1))
bs = batch_sharding(mesh)
rs = replicated_sharding(mesh)

# process-local half of a deterministic global batch (4 rows per process)
x_global = np.arange(8 * 3, dtype=np.float32).reshape(8, 3) / 10.0
y_global = np.arange(8, dtype=np.float32).reshape(8, 1)
lo, hi = pid * 4, (pid + 1) * 4
x = jax.make_array_from_process_local_data(bs, x_global[lo:hi])
y = jax.make_array_from_process_local_data(bs, y_global[lo:hi])
w = jax.device_put(np.ones((3, 1), np.float32), rs)

@jax.jit
def step(w, x, y):
    def loss(w):
        return jnp.mean((x @ w - y) ** 2)
    l, g = jax.value_and_grad(loss)(w)
    return l, w - 0.1 * g  # grad all-reduce over the mesh is implicit

l, w = step(w, x, y)
for _ in range(3):
    l, w = step(w, x, y)
print("RESULT", pid, float(l), *np.asarray(w).ravel().tolist(), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dp_step_matches_single_process(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    port = _free_port()
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=120)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, *vals = line.split()
                results[int(pid)] = [float(v) for v in vals]
    assert set(results) == {0, 1}, outs
    # both processes computed the SAME loss and SAME updated params -> the
    # gradient really was all-reduced across the process boundary
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)

    # single-process oracle
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3) / 10.0
    y = np.arange(8, dtype=np.float32).reshape(8, 1)
    w = np.ones((3, 1), np.float32)
    for _ in range(4):
        pred = x @ w
        loss = float(np.mean((pred - y) ** 2))
        g = 2.0 * x.T @ (pred - y) / 8.0
        w = w - 0.1 * g
    np.testing.assert_allclose(results[0], [loss, *w.ravel()], rtol=1e-4)
