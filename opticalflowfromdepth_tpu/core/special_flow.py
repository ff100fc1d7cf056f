"""Ground-truth flow fields for image-level geometric transforms (S5).

Re-design of the reference's ``SpecialFlow`` module
(`/root/reference/preprocess.py:24-105`). Returns both the forward flow
(original -> transformed) and the backward flow for each transform family:

  * type >= 7: shear
  * type >= 6: rotation around a random off-center pivot
  * type >= 5: flip

Faithfulness note: the reference constructs a *fresh* stateful SpecialFlow per
``augment_flow`` call and toggles its h/v latch at call entry
(`preprocess.py:49,83,113-118`), so in the snapshot's actual execution flips
are always **vertical** and shears always use the ``[[1, s], [0, 1]]``
(vertical-displacement) branch. We default to that effective behavior and
expose ``horizontal=`` for the latent other branch.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .geometry import pixel_grid_last
from .rng import get_random


def _to_flow(p1: jnp.ndarray, p_prev: jnp.ndarray, p0: jnp.ndarray
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    special = jnp.moveaxis(p1 - p0, -1, 0)
    back = jnp.moveaxis(p_prev - p0, -1, 0)
    return special, back


# The reference's alternating flip/shear toggles never flip back
# (`preprocess.py:49,83,113-118`), so the effective orientation is always
# VERTICAL. Shared constant so consumers (e.g. the synth pipeline's
# sort-free mirror fast path) stay visibly coupled to this choice.
FLIP_HORIZONTAL = False


def flip_flow(h: int, w: int, horizontal: bool = FLIP_HORIZONTAL
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flip flow field; default vertical (the reference's effective branch).

    Reference: `preprocess.py:47-60`.
    """
    p0 = pixel_grid_last(h, w)
    if horizontal:
        p1 = p0.at[..., 0].set(jnp.float32(w - 1) - p0[..., 0])
    else:
        p1 = p0.at[..., 1].set(jnp.float32(h - 1) - p0[..., 1])
    return _to_flow(p1, p1, p0)


def rotate_flow(key: jax.Array, h: int, w: int
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rotation flow around a random off-center pivot.

    pivot = (size/2 +- [size/2, 3*size/4]); |theta| in [8, 10] degrees, signed
    (get_random(2, 8) = sign * (U*2 + 8)). Reference: `preprocess.py:62-79`.
    """
    k_cx, k_cy, k_th = jax.random.split(key, 3)
    cx = get_random(k_cx, w / 4.0, w / 2.0) + w / 2.0
    cy = get_random(k_cy, h / 4.0, h / 2.0) + h / 2.0
    c0 = jnp.stack([cx, cy])
    theta = jnp.deg2rad(get_random(k_th, 2.0, 8.0))

    ct, st = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.array([[1.0, 0.0], [0.0, 1.0]]) * ct + \
        jnp.array([[0.0, -1.0], [1.0, 0.0]]) * st
    rev = jnp.array([[1.0, 0.0], [0.0, 1.0]]) * ct + \
        jnp.array([[0.0, 1.0], [-1.0, 0.0]]) * st

    p0 = pixel_grid_last(h, w)
    p1 = (p0 - c0) @ rot + c0
    p_prev = (p0 - c0) @ rev + c0
    return _to_flow(p1, p_prev, p0)


def shear_flow(key: jax.Array, h: int, w: int, horizontal: bool = False
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shear flow; |s| in [0.2, 0.35], signed (get_random(0.15, 0.2)).

    Default branch is the reference's effective one: ``[[1, s], [0, 1]]``
    (y displaced by s*x). Reference: `preprocess.py:81-99`.
    """
    s = get_random(key, 0.15, 0.2)
    eye = jnp.eye(2)
    if horizontal:
        off = jnp.array([[0.0, 0.0], [1.0, 0.0]])
    else:
        off = jnp.array([[0.0, 1.0], [0.0, 0.0]])
    shear = eye + off * s
    rev = eye - off * s
    p0 = pixel_grid_last(h, w)
    p1 = p0 @ shear
    p_prev = p0 @ rev
    return _to_flow(p1, p_prev, p0)


def special_flow(key: jax.Array, h: int, w: int, augment_flow_type: int
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch on augment type (5=flip, 6=rotate, 7=shear).

    Reference: `preprocess.py:31-45` (SpecialFlow.forward).
    """
    if augment_flow_type >= 7:
        return shear_flow(key, h, w)
    if augment_flow_type >= 6:
        return rotate_flow(key, h, w)
    if augment_flow_type >= 5:
        return flip_flow(h, w)
    raise ValueError(f"not a geometric augment type: {augment_flow_type}")
