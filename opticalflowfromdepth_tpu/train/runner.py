"""Generic training driver: loop + logging + validation + checkpoints.

The shared skeleton of the reference's two trainers
(`adjusted_RAFT/train.py:140-271`, `adjusted_gmflow/main.py:133-659`):

  * jitted sharded train step over the mesh ``data`` axis;
  * running-mean TensorBoard logging (rank 0);
  * periodic validation via pluggable validator callables;
  * dual checkpointing — numbered weights-only + ``latest`` full state
    (params/opt/step) every ``save_latest_freq`` (`main.py:502-518`) —
    and full resume (`main.py:236-253`).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, Iterable, Optional

import jax
import numpy as np

from ..data.loader import device_put_sharded_batch
from ..parallel.mesh import make_mesh
from ..utils.logging import Logger, append_val_results
from .state import TrainState, load_checkpoint, save_checkpoint, save_weights


@dataclass
class RunnerConfig:
    log_dir: str = "runs/default"
    num_steps: int = 100000
    val_freq: int = 10000
    save_ckpt_freq: int = 10000
    save_latest_freq: int = 1000
    log_img_freq: int = 5000
    resume: Optional[str] = None


class TrainRunner:
    def __init__(self, cfg: RunnerConfig, state: TrainState,
                 train_step: Callable, batches: Iterable,
                 lr_at: Optional[Callable[[int], float]] = None,
                 validators: Optional[Dict[str, Callable]] = None,
                 infer_fn_factory: Optional[Callable] = None,
                 mesh=None, seed: int = 0):
        self.cfg = cfg
        self.state = state
        self.mesh = mesh if mesh is not None else make_mesh()
        # Donate the input TrainState buffers: params + optimizer state are
        # the largest arrays in the step and the old state is dead the
        # moment the call returns (self.state is reassigned), so XLA may
        # write the updated state in place instead of double-buffering it
        # (hundreds of MB of avoidable HBM footprint/traffic at GMFlow
        # scale). The NaN-skip `jnp.where(ok, new, old)` select in the
        # trainers stays correct — donation is an aliasing hint, XLA still
        # reads the old buffers before reusing them.
        self.train_step = jax.jit(train_step, donate_argnums=(0,))
        self.batches = iter(batches)
        self.lr_at = lr_at
        self.validators = validators or {}
        self.infer_fn_factory = infer_fn_factory
        self.logger = Logger(cfg.log_dir,
                             enabled=jax.process_index() == 0)
        self.key = jax.random.PRNGKey(seed)
        if cfg.resume:
            self.state = load_checkpoint(cfg.resume, self.state)
            print(f"resumed from {cfg.resume} at step "
                  f"{int(self.state.step)}")

    def validate(self, step: int) -> Dict[str, float]:
        results: Dict[str, float] = {}
        if self.infer_fn_factory is None:
            return results
        infer_fn = self.infer_fn_factory(self.state)
        for name, fn in self.validators.items():
            try:
                results.update(fn(infer_fn))
            except Exception as e:  # noqa: BLE001 — a val step must never
                # kill a multi-day run. Missing data raises
                # FileNotFoundError, but a *partially* populated tree
                # surfaces as AssertionError / IndexError / ValueError from
                # dataset constructors (e.g. the FlyingChairs length assert,
                # data/datasets.py); log-and-skip them all, like the
                # reference's corrupt-sample skip (`dataloader.py:81-91`).
                print(f"validator {name} skipped "
                      f"({type(e).__name__}): {e}")
        if results and jax.process_index() == 0:
            self.logger.write_dict(step, results)
            append_val_results(self.cfg.log_dir, step, results)
            print(f"[val {step}] " + ", ".join(
                f"{k}={v:.4f}" for k, v in sorted(results.items())))
        return results

    def run(self) -> TrainState:
        cfg = self.cfg
        ckpt_dir = os.path.join(cfg.log_dir, "checkpoints")
        start = int(self.state.step)
        t0 = time.time()
        with self.mesh:
            for step in range(start, cfg.num_steps):
                batch = next(self.batches)
                batch = device_put_sharded_batch(batch, self.mesh)
                self.key, sub = jax.random.split(self.key)
                self.state, metrics = self.train_step(
                    self.state, batch, sub)
                lr = self.lr_at(step) if self.lr_at else None
                self.logger.push(
                    step, {k: float(v) for k, v in metrics.items()}, lr)

                nxt = step + 1
                if nxt % cfg.save_latest_freq == 0 and \
                        jax.process_index() == 0:
                    save_checkpoint(ckpt_dir, self.state, "latest")
                if nxt % cfg.save_ckpt_freq == 0 and \
                        jax.process_index() == 0:
                    save_weights(ckpt_dir, self.state.params,
                                 name=f"step_{nxt}_weights",
                                 batch_stats=self.state.batch_stats)
                if nxt % cfg.val_freq == 0:
                    self.validate(nxt)
        dt = time.time() - t0
        steps = cfg.num_steps - start
        if steps > 0:
            print(f"trained {steps} steps in {dt:.1f}s "
                  f"({steps / dt:.2f} it/s)")
        return self.state
