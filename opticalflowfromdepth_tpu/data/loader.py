"""Input pipeline: shuffling, batching, prefetch, per-host sharding.

Replaces torch DataLoader + DistributedSampler (`adjusted_RAFT/core/
datasets.py:354-358`, `adjusted_gmflow/main.py:410-422`):

  * :class:`Loader` — infinite shuffled batch iterator over a dataset of
    dict-of-numpy samples, with a thread-pool map (cv2/np release the GIL)
    and a bounded prefetch queue;
  * per-host sharding: each process reads only indices
    ``process_index::process_count`` of every epoch permutation —
    the DistributedSampler equivalent (epoch-seeded like ``set_epoch``);
  * :func:`device_put_sharded_batch` — place the host-local batch as a
    global jax.Array sharded over the mesh ``data`` axis
    (`jax.make_array_from_process_local_data`).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import jax
import numpy as np


def collate(samples) -> Dict[str, np.ndarray]:
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys
            if not isinstance(samples[0][k], (str, tuple, list))}


class Loader:
    """Infinite shuffled loader; one epoch = one seeded permutation."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 4, seed: int = 0,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None,
                 prefetch: int = 2, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.pi = (jax.process_index() if process_index is None
                   else process_index)
        self.pc = (jax.process_count() if process_count is None
                   else process_count)
        assert batch_size % self.pc == 0, (batch_size, self.pc)
        self.local_batch = batch_size // self.pc
        self.num_workers = max(num_workers, 1)
        self.prefetch = prefetch
        self.drop_last = drop_last

    def _index_stream(self) -> Iterator[int]:
        epoch = 0
        n = len(self.dataset)
        while True:
            if self.shuffle:
                # DistributedSampler.set_epoch equivalent: every process
                # draws the same permutation, takes a disjoint stride.
                order = np.random.default_rng(
                    self.seed + epoch).permutation(n)
            else:
                order = np.arange(n)
            yield from order[self.pi::self.pc]
            epoch += 1

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx_stream = self._index_stream()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            with ThreadPoolExecutor(self.num_workers) as pool:
                while not stop.is_set():
                    idxs = [next(idx_stream) for _ in range(self.local_batch)]
                    samples = list(pool.map(
                        lambda i: self.dataset[int(i)], idxs))
                    batch = collate(samples)
                    # bounded put with a stop check: a plain q.put would
                    # block forever once the consumer abandons the
                    # generator, leaking the thread + one pinned batch
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()
            try:                      # unblock a producer mid-put
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5.0)


def device_put_sharded_batch(batch: Dict[str, np.ndarray], mesh,
                             axis: str = "data",
                             process_count: Optional[int] = None
                             ) -> Dict[str, jax.Array]:
    """Host-local batch -> global jax.Array sharded on the mesh axis.

    ``process_count`` is overridable so single-process tests can exercise
    the multi-host `make_array_from_process_local_data` branch.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    pc = jax.process_count() if process_count is None else process_count
    out = {}
    for k, v in batch.items():
        sharding = NamedSharding(mesh, P(axis))
        if pc == 1:
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = jax.make_array_from_process_local_data(sharding, v)
    return out
