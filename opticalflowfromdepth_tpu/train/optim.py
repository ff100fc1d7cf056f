"""Optimizer + LR schedule factory (optax).

Mirrors the reference recipes:
  * RAFT: AdamW + OneCycle linear anneal, pct_start=0.05, steps+100
    (`adjusted_RAFT/train.py:83-90`), grad-clip 1.0 (`train.py:207`).
  * GMFlow: AdamW + OneCycle cosine anneal, pct_start=0.05
    (`adjusted_gmflow/main.py:230-231,425-432`), grad-clip
    (`main.py:489`).

torch OneCycleLR semantics reproduced: warm up from lr/div_factor
(div_factor=25) to lr over pct_start of total steps, then anneal to
lr/(div_factor*final_div_factor) (final_div_factor=1e4) linearly or
cosine.
"""

from __future__ import annotations

import math
from typing import Optional

import optax


def one_cycle_schedule(max_lr: float, total_steps: int,
                       pct_start: float = 0.05,
                       div_factor: float = 25.0,
                       final_div_factor: float = 1e4,
                       anneal_strategy: str = "linear"):
    """optax schedule matching torch.optim.lr_scheduler.OneCycleLR."""
    initial = max_lr / div_factor
    final = initial / final_div_factor
    warm = max(int(math.floor(pct_start * total_steps)), 1)
    cool = max(total_steps - warm, 1)

    warmup = optax.linear_schedule(initial, max_lr, warm)
    if anneal_strategy == "linear":
        anneal = optax.linear_schedule(max_lr, final, cool)
    elif anneal_strategy == "cos":
        anneal = optax.cosine_decay_schedule(max_lr, cool,
                                             alpha=final / max_lr)
    else:
        raise ValueError(anneal_strategy)
    return optax.join_schedules([warmup, anneal], [warm])


def make_optimizer(lr: float, num_steps: int, weight_decay: float,
                   epsilon: float = 1e-8, clip: float = 1.0,
                   anneal_strategy: str = "linear",
                   extra_steps: int = 100) -> optax.GradientTransformation:
    """AdamW + OneCycle + global-norm clip; reference `train.py:83-90,205-211`.

    ``extra_steps`` mirrors the reference's ``num_steps + 100`` schedule
    horizon.
    """
    schedule = one_cycle_schedule(lr, num_steps + extra_steps,
                                  anneal_strategy=anneal_strategy)
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=epsilon,
                    weight_decay=weight_decay),
    )
