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


_WORKER_MODEL = r"""
import os, sys
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_compilation_cache_dir", sys.argv[4])
# default min_compile_time is 60s: without this, the tiny-detector step
# recompiles in every worker on every suite run
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

pid = int(sys.argv[1]); port = sys.argv[2]; ckdir = sys.argv[3]
from layoutdit_tpu.config.constructs import DetectionBudget, MeshConfig
from layoutdit_tpu.parallel.mesh import (
    batch_sharding, build_mesh, maybe_distributed_init, replicated_sharding,
)

maybe_distributed_init(MeshConfig(
    enable_distributed_init=True, coordinator_address=f"localhost:{port}",
    num_processes=2, process_id=pid,
))
mesh = build_mesh(MeshConfig(data_parallel=2, model_parallel=1))

import jax.numpy as jnp
import numpy as np
import optax
from layoutdit_tpu.models.backbone import BackboneConfig
from layoutdit_tpu.models.detection.detector import (
    DetectorConfig, detector_loss, init_detector_params,
)
from layoutdit_tpu.models.vit import ViTConfig

tiny = ViTConfig(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                 intermediate_size=64, image_size=64)
budget = DetectionBudget(
    rpn_pre_nms_top_n_train=64, rpn_post_nms_top_n_train=64,
    rpn_batch_size_per_image=32, box_batch_size_per_image=16,
)
dcfg = DetectorConfig(backbone=BackboneConfig(vit=tiny, fpn_out_channels=32),
                      image_size=64, budget=budget)
rs, bs = replicated_sharding(mesh), batch_sharding(mesh)
params = jax.device_put(init_detector_params(jax.random.PRNGKey(0), dcfg), rs)
opt = optax.adamw(1e-3)
opt_state = jax.device_put(opt.init(params), rs)

rng = np.random.default_rng(0)
imgs = rng.uniform(0, 1, (2, 3, 64, 64)).astype(np.float32)
gtb = np.asarray([[[5, 5, 30, 40]], [[10, 10, 50, 60]]], np.float32)
gtl = np.ones((2, 1), np.int32)
gtv = np.ones((2, 1), bool)
lo, hi = pid, pid + 1
put = lambda a: jax.make_array_from_process_local_data(bs, a[lo:hi])
im, gb, gl, gv = put(imgs), put(gtb), put(gtl), put(gtv)

@jax.jit
def step(params, opt_state, im, gb, gl, gv):
    def total(p):
        losses = detector_loss(p, jax.random.PRNGKey(1), im, gb, gl, gv, dcfg)
        return sum(losses.values())
    loss, g = jax.value_and_grad(total)(params)
    upd, opt_state = opt.update(g, opt_state, params)
    return loss, optax.apply_updates(params, upd), opt_state

loss, params, opt_state = step(params, opt_state, im, gb, gl, gv)
leaves = jax.tree_util.tree_leaves(params)
checksum = float(sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in leaves))
print("RESULT", pid, float(loss), checksum, flush=True)

# orbax per-shard checkpoint written cooperatively from BOTH processes,
# then restored into the same shardings and compared exactly
from layoutdit_tpu.train.checkpoint import (
    load_checkpoint_sharded, save_checkpoint_sharded,
)
save_checkpoint_sharded(ckdir, params, opt_state, epoch=1)
state = load_checkpoint_sharded(ckdir, params, opt_state)
same = all(
    bool(jnp.all(a == b))
    for a, b in zip(jax.tree_util.tree_leaves(state["params"]), leaves)
)
print("CKPT", pid, int(same), state["epoch"], flush=True)
"""


@pytest.mark.slow
def test_two_process_real_detector_step_and_orbax_roundtrip(tmp_path):
    """The real model through the 2-process harness (VERDICT r2 item 7):
    one tiny-detector train step under dp=2 (TP-shaped params, PRNG
    streams, optax state), identical post-step params on both processes,
    and an orbax checkpoint written from both processes and restored."""
    worker = tmp_path / "worker_model.py"
    worker.write_text(_WORKER_MODEL)
    ckdir = str(tmp_path / "ck")
    cache = os.path.join(REPO, ".jax_cache")
    port = _free_port()
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port), ckdir, cache],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out

    results, ckpt = {}, {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, *vals = line.split()
                results[int(pid)] = [float(v) for v in vals]
            if line.startswith("CKPT"):
                _, pid, same, epoch = line.split()
                ckpt[int(pid)] = (int(same), int(epoch))
    assert set(results) == {0, 1}, outs
    # the grad all-reduce spanned the process boundary: same loss, same
    # updated-params checksum on both processes
    np.testing.assert_allclose(results[0], results[1], rtol=1e-5)
    assert ckpt == {0: (1, 1), 1: (1, 1)}, outs
