"""Two-process CPU-cluster distributed training test (SURVEY.md §5.8).

The reference's multi-node path is operational code — its launchers
perform an env-var rendezvous and DDP gradient all-reduce
(`adjusted_gmflow/utils/dist_utils.py:12-70`, `main.py:159-214`). Our
equivalent is `parallel/mesh.py:init_distributed` +
`jax.make_array_from_process_local_data`; this test actually LAUNCHES a
2-process jax.distributed cluster on CPU (gloo collectives, localhost
coordinator) and runs a real sharded GMFlow train step in it:

  * env-var rendezvous through init_distributed (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID — the reference's RANK/WORLD_SIZE
    analog);
  * each process contributes its process-local half of the global batch
    via `data.loader.device_put_sharded_batch` (DistributedSampler
    equivalent);
  * the jitted train step runs with the batch sharded over all 4 devices
    of the 2-process mesh — the gradient all-reduce crosses the process
    boundary (gloo);
  * both processes must agree on the loss, and it must match a
    single-process run of the same global batch.
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

WORKER = r"""
import json, os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["OFD_REPO"])

from opticalflowfromdepth_tpu.parallel.mesh import init_distributed, make_mesh
init_distributed()   # env-var rendezvous (parallel/mesh.py:27-42)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.local_devices()) == 2
assert len(jax.devices()) == 4

import jax.numpy as jnp
from opticalflowfromdepth_tpu.train.gmflow_train import (
    GMFlowTrainConfig, init_state, make_train_step)
from opticalflowfromdepth_tpu.data.loader import device_put_sharded_batch

pid = jax.process_index()
h, w, gb = 32, 48, 4
rng = np.random.default_rng(0)
batch_global = {
    "image1": rng.uniform(0, 255, (gb, h, w, 3)).astype(np.float32),
    "image2": rng.uniform(0, 255, (gb, h, w, 3)).astype(np.float32),
    "flow": np.full((gb, h, w, 2), 1.5, np.float32),
    "valid": np.ones((gb, h, w), np.float32),
    "label": np.eye(4, dtype=np.float32)[np.zeros(gb, np.int64)],
}
# per-process half, exactly what the per-host Loader would read
local = {k: v[pid * 2:(pid + 1) * 2] for k, v in batch_global.items()}

cfg = GMFlowTrainConfig(image_size=(h, w), num_steps=10, batch_size=gb,
                        mixed_precision=False)
# numpy leaves: identical on every process => valid replicated jit inputs
state = jax.tree.map(np.asarray, init_state(cfg, jax.random.PRNGKey(0)))
mesh = make_mesh()
with mesh:
    batch = device_put_sharded_batch(local, mesh)
    step = jax.jit(make_train_step(cfg))
    state, m1 = step(state, batch, jax.random.PRNGKey(1))
    state, m2 = step(state, batch, jax.random.PRNGKey(2))
print("RESULT " + json.dumps({
    "pid": pid,
    "loss1": float(m1["total_loss"]),
    "loss2": float(m2["total_loss"]),
}), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cluster_matches_single_process(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()

    procs = []
    for pid in range(2):
        env = {k: v for k, v in os.environ.items()
               if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
        env.update({
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "OFD_REPO": REPO,
        })
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    results = {}
    logs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"worker {pid} timed out")
        logs.append(out)
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["pid"]] = r
    assert sorted(results) == [0, 1], logs

    # both processes see the same (replicated) global loss
    assert results[0]["loss1"] == pytest.approx(results[1]["loss1"], rel=1e-6)
    assert results[0]["loss2"] == pytest.approx(results[1]["loss2"], rel=1e-6)
    # the optimizer applied an update between the two steps
    assert results[0]["loss1"] != results[0]["loss2"]

    # single-process reference on this process's CPU mesh: same global
    # batch, same seeds, 4 data-sharded devices -> same loss up to f32
    # reduction-order noise
    import jax
    import jax.numpy as jnp  # noqa: F401
    from opticalflowfromdepth_tpu.data.loader import device_put_sharded_batch
    from opticalflowfromdepth_tpu.parallel.mesh import make_mesh
    from opticalflowfromdepth_tpu.train.gmflow_train import (
        GMFlowTrainConfig, init_state, make_train_step)

    h, w, gb = 32, 48, 4
    rng = np.random.default_rng(0)
    batch = {
        "image1": rng.uniform(0, 255, (gb, h, w, 3)).astype(np.float32),
        "image2": rng.uniform(0, 255, (gb, h, w, 3)).astype(np.float32),
        "flow": np.full((gb, h, w, 2), 1.5, np.float32),
        "valid": np.ones((gb, h, w), np.float32),
        "label": np.eye(4, dtype=np.float32)[np.zeros(gb, np.int64)],
    }
    cfg = GMFlowTrainConfig(image_size=(h, w), num_steps=10, batch_size=gb,
                            mixed_precision=False)
    state = init_state(cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(jax.devices()[:4])
    with mesh:
        placed = device_put_sharded_batch(batch, mesh)
        step = jax.jit(make_train_step(cfg))
        state, m1 = step(state, placed, jax.random.PRNGKey(1))
        state, m2 = step(state, placed, jax.random.PRNGKey(2))
    assert results[0]["loss1"] == pytest.approx(float(m1["total_loss"]),
                                                rel=1e-4)
    assert results[0]["loss2"] == pytest.approx(float(m2["total_loss"]),
                                                rel=1e-4)
