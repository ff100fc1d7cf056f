"""Depth <-> disparity <-> flow conversions (S3).

Re-design of the reference's ``Convert`` namespace
(`/root/reference/preprocess.py:237-298`). All functions are pure and take
explicit JAX PRNG keys where the reference drew torch globals.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import camera
from .geometry import backproject_depth, pixel_grid, project_3d
from .rng import get_random


def depth_to_disparity(key: jax.Array, depth: jnp.ndarray) -> jnp.ndarray:
    """disparity = s * B * f / depth, s ~ U[0.8, 1.1].

    Reference: `preprocess.py:238-246`.
    """
    s = get_random(key, 0.3, 0.8, random_sign=False)
    return s * camera.BASELINE * camera.FOCAL / depth


def disparity_to_flow(disparity: jnp.ndarray,
                      key: Optional[jax.Array] = None,
                      random_sign: bool = True) -> jnp.ndarray:
    """Stereo disparity [1, H, W] -> purely horizontal flow [2, H, W].

    flow = (-d, 0), optionally flipped in sign with p=0.5.
    Reference: `preprocess.py:248-254`.
    """
    flow = jnp.concatenate([disparity, jnp.zeros_like(disparity)], axis=0) * -1.0
    if random_sign:
        assert key is not None
        flow = flow * get_random(key, 0.0, 1.0)  # = +-1
    return flow


def disparity_to_depth(disparity: jnp.ndarray) -> jnp.ndarray:
    """depth = B * f / (disparity + 0.005). Reference: `preprocess.py:256-262`."""
    return camera.BASELINE * camera.FOCAL / (disparity + 0.005)


def depth_to_random_flow(key: jax.Array, depth: jnp.ndarray,
                         T1: Optional[jnp.ndarray] = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full 2-D flow induced by a random virtual camera motion.

    Backprojects ``depth`` [1, H, W] with the plausible intrinsics, applies a
    random SE(3) (angle pi/36*[1,2] per axis, translation [0.1,0.2], signed),
    reprojects, and returns ``(flow [2, H, W], T1 [1, 4, 4])``.

    Reference: `preprocess.py:264-298`.
    """
    _, h, w = depth.shape
    K, inv_K = camera.intrinsics(h, w)
    cam_points = backproject_depth(depth[None], inv_K)
    if T1 is None:
        T1, _, _ = camera.random_motion(key, 1.0 / 36.0, 1.0 / 36.0, 0.1, 0.1)
    p1, _ = project_3d(cam_points, K, T1, h, w)  # [-1, 1], [1, H, W, 2]
    p1 = (p1 + 1.0) / 2.0
    p1 = p1 * jnp.asarray([w - 1, h - 1], p1.dtype)
    p0 = jnp.moveaxis(pixel_grid(h, w), 0, -1)  # [H, W, 2]
    flow = (p1[0] - p0)  # [H, W, 2]
    return jnp.moveaxis(flow, -1, 0), T1
