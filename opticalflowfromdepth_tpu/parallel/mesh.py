"""Device mesh construction & sharding rules (T3 TPU-native equivalent).

The reference scales with DDP/NCCL (`adjusted_gmflow/utils/dist_utils.py`,
`main.py:159-214`); the TPU-native design is one global mesh + pjit:

  * a 1-D ``data`` axis spanning every chip (DCN between hosts, ICI within a
    slice) carries the global batch — gradient all-reduce is inserted by XLA
    when the loss is averaged over a sharded batch;
  * an optional ``model`` axis is reserved for sharding the token axis of
    global-matching attention/correlation on large images (SURVEY.md §5.7).

Multi-host: call :func:`init_distributed` once per process (replaces the
pytorch/mpi/slurm rendezvous of `dist_utils.py:12-70`), then build the mesh
over jax.devices() — identical code on 1 chip, 1 host, or N hosts.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host init; env-var rendezvous like the reference launchers.

    No-op for single-process runs. Honors JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID when args are absent.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes or int(os.environ["JAX_NUM_PROCESSES"]),
        process_id=process_id or int(os.environ["JAX_PROCESS_ID"]),
    )


def make_mesh(devices: Optional[Sequence] = None,
              model_parallel: int = 1,
              axis_names: Tuple[str, str] = ("data", "model")) -> Mesh:
    """Build a (data, model) mesh over all devices (model axis size 1 by
    default = pure data parallelism, the reference's only strategy)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host-global batch pytree with batch-axis sharding."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
