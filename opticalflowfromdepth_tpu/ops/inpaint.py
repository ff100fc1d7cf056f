"""On-device hole filling — the TPU-native replacement for cv2.inpaint (S8).

The reference (`/root/reference/utils.py:136-151`) round-trips every warped
image to the CPU for a Telea inpaint; beating its frames/s hinges on keeping
this on-device (SURVEY.md §7 hard part 4). Behavioral parity target is a
*plausible* fill of the disocclusion holes, not bit-exactness.

Mask semantics are replicated exactly (`utils.py:137-142`):
    M  = (valid != collision)
    M' = dilate3x3(M)
    P  = (M' == M)
    keep = valid * P          # pixels kept as-is
    fill everywhere keep == 0

The fill itself is a pull-push (pyramid) reconstruction: validity-weighted
average pyramids down to 1x1, then coarse-to-fine pushes that only fill
holes. This covers arbitrarily large holes in O(log max(H, W)) conv passes,
all static-shape and fusible by XLA. The reference quantizes through uint8
(`utils.py:148-149`); we mirror that with a floor+clip on the result.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _dilate3x3(mask: jnp.ndarray) -> jnp.ndarray:
    """Binary 3x3 dilation of [H, W] mask."""
    return lax.reduce_window(mask, -jnp.inf, lax.max,
                             (3, 3), (1, 1), "SAME")


def _avgpool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 mean pool of [C, H, W] (pads odd sizes with zeros)."""
    c, h, w = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw)))
    s = lax.reduce_window(x, 0.0, lax.add, (1, 2, 2), (1, 2, 2), "VALID")
    return s / 4.0


def _upsample2(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Nearest 2x upsample of [C, h2, w2] cropped to [C, h, w]."""
    up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return up[:, :h, :w]


def pullpush_fill(img: jnp.ndarray, keep: jnp.ndarray) -> jnp.ndarray:
    """Fill ``img`` [C, H, W] where ``keep`` [H, W] is 0, via pull-push."""
    c, h, w = img.shape
    m = keep[None].astype(img.dtype)
    levels = [(img * m, m)]
    lh, lw = h, w
    while lh > 1 or lw > 1:
        i_prev, m_prev = levels[-1]
        levels.append((_avgpool2(i_prev), _avgpool2(m_prev)))
        lh, lw = levels[-1][0].shape[1:]
    # coarsest estimate
    i_k, m_k = levels[-1]
    est = i_k / jnp.maximum(m_k, 1e-8)
    for i_k, m_k in reversed(levels[:-1]):
        hh, ww = i_k.shape[1:]
        up = _upsample2(est, hh, ww)
        val = i_k / jnp.maximum(m_k, 1e-8)
        # blend: trust this level where it has support, else the coarse push
        alpha = jnp.minimum(m_k, 1.0)
        est = alpha * val + (1.0 - alpha) * up
    return jnp.where(keep[None] > 0, img, est)


def inpaint(img: jnp.ndarray, valid: jnp.ndarray, collision: jnp.ndarray
            ) -> jnp.ndarray:
    """Inpaint warped-image holes; mirrors `utils.py:136-151` semantics.

    Args:
      img:       [C, H, W] image (typically [0, 255]).
      valid:     [1, H, W] binary hit mask from forward_warp.
      collision: [1, H, W] binary collision mask from forward_warp.

    Returns:
      [C, H, W] float32 image, holes filled, quantized like the reference's
      uint8 round-trip (truncate + clip to [0, 255]).
    """
    H = valid[0]
    M = (H != collision[0]).astype(jnp.float32)
    Mp = _dilate3x3(M)
    P = (Mp == M).astype(jnp.float32)
    keep = H * P
    filled = pullpush_fill(img, keep)
    return jnp.clip(jnp.floor(filled), 0.0, 255.0)
