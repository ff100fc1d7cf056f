"""Jitted inference functions for the validators/submissions.

Bridges model families to the model-agnostic eval plane: each factory
returns ``infer_fn(image1, image2, ...) -> flow`` on NHWC numpy/jax arrays.
jax.jit caches one executable per padded shape bucket (eval shapes are
constant per dataset).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp


def raft_infer_fn(model, variables, iters: int = 24,
                  with_low_res: bool = False) -> Callable:
    """RAFT eval forward (`adjusted_RAFT/evaluate.py:106-113`: iters=24,
    test_mode). ``with_low_res`` returns (low_res, up) for warm start."""

    @partial(jax.jit, static_argnames=())
    def _fwd(image1, image2, flow_init):
        low, up = model.apply(variables, image1, image2, iters=iters,
                              flow_init=flow_init, test_mode=True,
                              train=False)
        return low, up

    def infer(image1, image2, flow_init=None):
        i1 = jnp.asarray(image1, jnp.float32)
        i2 = jnp.asarray(image2, jnp.float32)
        if flow_init is None:
            b, h, w, _ = i1.shape
            flow_init = jnp.zeros((b, h // 8, w // 8, 2), jnp.float32)
        low, up = _fwd(i1, i2, jnp.asarray(flow_init, jnp.float32))
        return (low, up) if with_low_res else up

    return infer


def gmflow_infer_fn(model, variables,
                    attn_splits_list: Sequence[int] = (2,),
                    corr_radius_list: Sequence[int] = (-1,),
                    prop_radius_list: Sequence[int] = (-1,),
                    pred_bidir_flow: bool = False) -> Callable:
    """GMFlow eval forward (`adjusted_gmflow/evaluate.py` model calls)."""

    @jax.jit
    def _fwd(image1, image2):
        out = model.apply(variables, image1, image2,
                          attn_splits_list=tuple(attn_splits_list),
                          corr_radius_list=tuple(corr_radius_list),
                          prop_radius_list=tuple(prop_radius_list),
                          pred_bidir_flow=pred_bidir_flow,
                          training=False)
        return out["flow_preds"][-1]

    def infer(image1, image2):
        return _fwd(jnp.asarray(image1, jnp.float32),
                    jnp.asarray(image2, jnp.float32))

    return infer
