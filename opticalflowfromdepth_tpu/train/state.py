"""Train state + checkpointing.

Checkpoint contract mirrors the reference's two schemes (SURVEY.md §5.4):
  * weights-only warm start across stages (`adjusted_RAFT/train.py:146-147`,
    strict=False semantics = restore matching subtree);
  * full resume: params + optimizer + step (+ batch stats), with the OneCycle
    schedule step-aligned on restore (`adjusted_gmflow/main.py:236-253,
    424-432`) — our schedule is a pure function of the step inside the
    optimizer state, so alignment is automatic.

Orbax is used for the on-disk format.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.training import train_state as flax_train_state


class TrainState(flax_train_state.TrainState):
    """flax TrainState + mutable batch stats (RAFT cnet batch norm)."""
    batch_stats: Any = None


def create_train_state(model, variables: Dict, tx: optax.GradientTransformation
                       ) -> TrainState:
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=tx,
    )


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def _save(target: str, payload) -> None:
    import orbax.checkpoint as ocp
    _ckptr().save(target, args=ocp.args.PyTreeSave(payload), force=True)


def _restore(target: str, template):
    """Restore via the ocp.args API (the legacy item=/restore_args= kwargs
    are deprecated, ADVICE r4). The item template is required either way:
    without it orbax infers the tree from on-disk metadata, where optax's
    tuple/NamedTuple opt_state comes back as lists and clashes with the
    tuple-structured restore_args (caught by the test_cli_smoke resume
    path)."""
    import orbax.checkpoint as ocp
    return _ckptr().restore(
        target,
        args=ocp.args.PyTreeRestore(
            item=template,
            restore_args=ocp.checkpoint_utils.construct_restore_args(
                template)))


def save_checkpoint(path: str, state: TrainState,
                    name: str = "latest") -> str:
    """Full checkpoint (params+opt+step) at ``path/<name>``
    (the reference's checkpoint_latest.pth scheme, `main.py:509-518`)."""
    target = os.path.join(os.path.abspath(path), name)
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "batch_stats": state.batch_stats,
        "step": jnp.asarray(int(state.step)),
    }
    _save(target, payload)
    return target


def save_weights(path: str, params, name: str = "weights",
                 batch_stats=None) -> str:
    """Weights-only checkpoint for stage chaining (`train_mixed.sh:3-6`).

    Includes BN running stats when present — torch state_dicts carry them,
    and eval needs them."""
    target = os.path.join(os.path.abspath(path), name)
    payload = {"params": params}
    if batch_stats is not None:
        payload["batch_stats"] = batch_stats
    _save(target, payload)
    return target


def load_checkpoint(target: str, state: TrainState) -> TrainState:
    """Full resume; restores params/opt/step into ``state``."""
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "batch_stats": state.batch_stats,
        "step": jnp.asarray(0),
    }
    restored = _restore(os.path.abspath(target), template)
    # orbax commits restored arrays to a single device; hand back numpy
    # leaves (uncommitted => valid replicated inputs beside a mesh-sharded
    # batch, in single- AND multi-process runs — every process restores
    # the same bytes)
    restored = jax.tree.map(np.asarray, restored)
    return state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        batch_stats=restored["batch_stats"],
        step=int(restored["step"]),
    )


def load_weights(target: str, params, batch_stats=None):
    """Weights-only warm start (strict=False analog: template-shaped).

    Returns params, or (params, batch_stats) when a batch_stats template
    is given."""
    item = {"params": params}
    if batch_stats is not None:
        item["batch_stats"] = batch_stats
    restored = _restore(os.path.abspath(target), item)
    if batch_stats is not None:
        return restored["params"], restored["batch_stats"]
    return restored["params"]
