"""Forward-backward flow consistency occlusion check.

Reference `adjusted_gmflow/gmflow/geometry.py:75-96` (UnFlow thresholds
alpha=0.01, beta=0.5). NHWC jnp implementation; jit-safe.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..ops.sampling import flow_warp


def forward_backward_consistency_check(
        fwd_flow: jnp.ndarray, bwd_flow: jnp.ndarray,
        alpha: float = 0.01, beta: float = 0.5
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """fwd/bwd flow: [B, H, W, 2] -> (fwd_occ, bwd_occ) [B, H, W] float."""
    mag = (jnp.linalg.norm(fwd_flow, axis=-1) +
           jnp.linalg.norm(bwd_flow, axis=-1))

    def warp(feat, flow):
        # flow_warp works in NCHW
        return flow_warp(jnp.moveaxis(feat, -1, 1),
                         jnp.moveaxis(flow, -1, 1)).transpose(0, 2, 3, 1)

    warped_bwd = warp(bwd_flow, fwd_flow)
    warped_fwd = warp(fwd_flow, bwd_flow)

    diff_fwd = jnp.linalg.norm(fwd_flow + warped_bwd, axis=-1)
    diff_bwd = jnp.linalg.norm(bwd_flow + warped_fwd, axis=-1)
    threshold = alpha * mag + beta
    return ((diff_fwd > threshold).astype(jnp.float32),
            (diff_bwd > threshold).astype(jnp.float32))
