"""Plausible-camera model: fixed intrinsics template + random SE(3) motion.

Re-design of the reference's ``Plausible`` namespace
(`/root/reference/preprocess.py:184-235`):

  * focal length  f = 1, stereo baseline B = 50;
  * intrinsics template K with fx = fy = 0.58, cx = cy = 0.5, scaled by (w, h);
  * random camera motion: per-axis signed angles/translations via get_random.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .geometry import transformation_from_parameters
from .rng import get_random_vec

FOCAL = 1.0        # Plausible.f  (`preprocess.py:185-187`)
BASELINE = 50.0    # Plausible.B  (`preprocess.py:189-191`)


def intrinsics(h: int, w: int, another: bool = False
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed plausible intrinsics (K, inv_K), each [1, 4, 4].

    Reference: `preprocess.py:193-209` — the 2x2 upper block is doubled
    *before* the (w, h) row scaling when ``another``.
    """
    s = 2.0 if another else 1.0
    fx, cx = 0.58 * s * w, 0.5 * w
    fy, cy = 0.58 * s * h, 0.5 * h
    K = jnp.array([[[fx, 0.0, cx, 0.0],
                    [0.0, fy, cy, 0.0],
                    [0.0, 0.0, 1.0, 0.0],
                    [0.0, 0.0, 0.0, 1.0]]], jnp.float32)
    # analytic inverse — exact, and avoids low-precision TPU linalg paths
    inv_K = jnp.array([[[1.0 / fx, 0.0, -cx / fx, 0.0],
                        [0.0, 1.0 / fy, -cy / fy, 0.0],
                        [0.0, 0.0, 1.0, 0.0],
                        [0.0, 0.0, 0.0, 1.0]]], jnp.float32)
    return K, inv_K


def random_motion(key: jax.Array,
                  axisangle_range: float, axisangle_base: float,
                  translation_range: float, translation_base: float,
                  another_axisangle: Optional[jnp.ndarray] = None,
                  another_translation: Optional[jnp.ndarray] = None):
    """Random SE(3) camera motion.

    Per-axis angle magnitude in pi*[base, base+range] with random sign;
    translation magnitude in [base, base+range] with random sign.

    Returns (T [1, 4, 4], axisangle [1, 1, 3], translation [1, 1, 3]).
    Reference: `preprocess.py:211-235`.
    """
    k_ang, k_tr = jax.random.split(key)
    ang = get_random_vec(k_ang, 3, math.pi * axisangle_range,
                         math.pi * axisangle_base)
    tr = get_random_vec(k_tr, 3, translation_range, translation_base)
    axisangle = ang.reshape(1, 1, 3)
    translation = tr.reshape(1, 1, 3)
    if another_axisangle is not None and another_translation is not None:
        T = transformation_from_parameters(axisangle + another_axisangle,
                                           translation + another_translation)
    else:
        T = transformation_from_parameters(axisangle, translation)
    return T, axisangle, translation
