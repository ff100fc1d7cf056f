"""Observability (O1): TensorBoard logging + persistent artifacts.

Mirrors the reference's two Loggers:
  * running means flushed every SUM_FREQ=100 steps with lr
    (`adjusted_RAFT/train.py:93-137`, `adjusted_gmflow/utils/logger.py:6-68`);
  * side-by-side image summaries of predicted vs GT flow rendered through
    the Middlebury wheel (`utils/logger.py:44-65`);
  * sidecar artifacts: args.json + invoked command
    (`adjusted_gmflow/utils/misc.py:19-37`) and markdown `val_results.txt`
    (`main.py:602-650`).

Rank-0 discipline: construct with ``enabled=jax.process_index() == 0``.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, Optional

import numpy as np

SUM_FREQ = 100  # `train.py:47`


class Logger:
    def __init__(self, log_dir: str, enabled: bool = True,
                 sum_freq: int = SUM_FREQ):
        self.enabled = enabled
        self.sum_freq = sum_freq
        self.running: Dict[str, float] = {}
        self.count = 0
        self.writer = None
        self.log_dir = log_dir
        if enabled:
            os.makedirs(log_dir, exist_ok=True)
            from tensorboardX import SummaryWriter
            self.writer = SummaryWriter(log_dir)

    def push(self, step: int, metrics: Dict[str, float],
             lr: Optional[float] = None) -> None:
        if not self.enabled:
            return
        for k, v in metrics.items():
            self.running[k] = self.running.get(k, 0.0) + float(v)
        self.count += 1
        if self.count >= self.sum_freq:
            for k, v in self.running.items():
                self.writer.add_scalar(k, v / self.count, step)
            if lr is not None:
                self.writer.add_scalar("lr", lr, step)
            means = {k: v / self.count for k, v in self.running.items()}
            msg = ", ".join(f"{k}={v:.4f}" for k, v in sorted(means.items()))
            print(f"[step {step}] {msg}")
            self.running = {}
            self.count = 0

    def write_dict(self, step: int, results: Dict[str, float]) -> None:
        if not self.enabled:
            return
        for k, v in results.items():
            self.writer.add_scalar(k, float(v), step)

    def flow_image_summary(self, step: int, tag: str, pred: np.ndarray,
                           gt: np.ndarray) -> None:
        """Side-by-side pred|gt flow colorization (`logger.py:44-65`)."""
        if not self.enabled:
            return
        from .flow_viz import flow_to_color
        img = np.concatenate(
            [flow_to_color(np.asarray(pred)), flow_to_color(np.asarray(gt))],
            axis=1)
        self.writer.add_image(tag, img, step, dataformats="HWC")

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()


def save_args(log_dir: str, args) -> None:
    """args.json + command sidecars (`misc.py:19-37`)."""
    os.makedirs(log_dir, exist_ok=True)
    payload = args if isinstance(args, dict) else vars(args)
    with open(os.path.join(log_dir, "args.json"), "w") as f:
        json.dump({k: v for k, v in payload.items()
                   if isinstance(v, (int, float, str, bool, list, tuple,
                                     type(None)))}, f, indent=2)
    with open(os.path.join(log_dir, "command_train.txt"), "a") as f:
        f.write(time.strftime("%Y-%m-%d %H:%M:%S") + "\n" +
                " ".join(sys.argv) + "\n")


def append_val_results(log_dir: str, step: int,
                       results: Dict[str, float]) -> None:
    """Markdown val_results.txt table rows (`main.py:602-650`)."""
    path = os.path.join(log_dir, "val_results.txt")
    new = not os.path.exists(path)
    with open(path, "a") as f:
        if new:
            f.write("| step | " + " | ".join(sorted(results)) + " |\n")
            f.write("|---" * (len(results) + 1) + "|\n")
        f.write(f"| {step} | " + " | ".join(
            f"{results[k]:.4f}" for k in sorted(results)) + " |\n")
