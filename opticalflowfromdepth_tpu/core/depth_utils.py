"""Depth-hygiene utilities (pure jnp, functional).

Re-design of the reference's in-place torch mutations
(`/root/reference/utils.py:102-126`) as masked functional ops.
All depths live in [1, 100] with 100 as the "invalid / infinitely far"
sentinel (the forward-warp z-buffer and downstream valid masks rely on this).
"""

from __future__ import annotations

import jax.numpy as jnp

INVALID_DEPTH = 100.0


def normalize_depth(depth: jnp.ndarray) -> jnp.ndarray:
    """Rescale valid depth to [1, 99]; invalid (0 or >100) pixels -> 100.

    Functional equivalent of `utils.py:102-116`:
      1. sentinel 0 and >100 become 100;
      2. dmin = min over the array after step 1 (= min of valid values when
         any pixel is valid, since valid values are < 100);
      3. dmax = max of valid values (sentinels temporarily zeroed);
      4. valid values -> (d - dmin) * 98 / (dmax - dmin) + 1;
      5. sentinel pixels -> 100.
    """
    d = jnp.where((depth == 0) | (depth > 100.0), 100.0, depth)
    invalid = d == 100.0
    dmin = jnp.min(d)
    d0 = jnp.where(invalid, 0.0, d)
    dmax = jnp.max(d0)
    denom = jnp.where(dmax == dmin, 1.0, dmax - dmin)
    scaled = (d - dmin) * 98.0 / denom + 1.0
    return jnp.where(invalid, INVALID_DEPTH, scaled)


def smooth_closer(depth: jnp.ndarray) -> jnp.ndarray:
    """Invert 8-bit relative depth ("closer is larger") to metric-ish depth.

    Reference: `utils.py:118-121` — clamp at 240, then 1 / (255 - d).
    """
    d = jnp.minimum(depth, 240.0)
    return 1.0 / (255.0 - d)


def fix_warped_depth(depth: jnp.ndarray) -> jnp.ndarray:
    """Holes (0) and near-max (>99.5) depth -> the 100 sentinel.

    Reference: `utils.py:123-126`.
    """
    return jnp.where((depth == 0) | (depth > 99.5), INVALID_DEPTH, depth)
